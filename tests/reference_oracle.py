"""Import the reference implementation (read-only, /root/reference) as a
*test-time oracle* for byte-identical extraction parity.

The reference has unimportable optional deps in this sandbox
(``mashumaro``, ``defusedxml``, generated ``bluesearch.version``); we stub
just enough for ``bluesearch.database.article`` to import. Nothing from the
reference is executed outside the test suite.
"""

from __future__ import annotations

import sys
import types
import xml.etree.ElementTree as RealET

_REFERENCE_SRC = "/root/reference/src"


def load_reference_article_module():
    if _REFERENCE_SRC not in sys.path:
        sys.path.insert(0, _REFERENCE_SRC)

    if "defusedxml" not in sys.modules:
        d = types.ModuleType("defusedxml")
        det = types.ModuleType("defusedxml.ElementTree")
        for attr in dir(RealET):
            if not attr.startswith("_"):
                setattr(det, attr, getattr(RealET, attr))
        d.ElementTree = det
        sys.modules["defusedxml"] = d
        sys.modules["defusedxml.ElementTree"] = det

    if "bluesearch.version" not in sys.modules:
        v = types.ModuleType("bluesearch.version")
        v.__version__ = "0.0.0"
        sys.modules["bluesearch.version"] = v

    if "mashumaro" not in sys.modules:
        m = types.ModuleType("mashumaro")
        mm = types.ModuleType("mashumaro.mixins")
        mj = types.ModuleType("mashumaro.mixins.json")

        class DataClassJSONMixin:  # minimal stand-in
            pass

        mj.DataClassJSONMixin = DataClassJSONMixin
        sys.modules["mashumaro"] = m
        sys.modules["mashumaro.mixins"] = mm
        sys.modules["mashumaro.mixins.json"] = mj

    import bluesearch.database.article as article_module

    return article_module


def reference_element_to_str(xml_fragment: str) -> str:
    """Run the reference's ``_element_to_str`` on one XML fragment string."""
    article = load_reference_article_module()
    parser = article.JATSXMLParser.__new__(article.JATSXMLParser)
    element = RealET.fromstring(xml_fragment)
    return parser._element_to_str(element)
