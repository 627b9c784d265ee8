from search_spark.extraction.html_text import (  # noqa: F401
    HTML_PROFILE,
    JATS_PROFILE,
    TagProfile,
    extract_paragraphs,
    render_element,
)
from search_spark.extraction.extract import extract_stage  # noqa: F401
