"""spark-submit entrypoint for the KG-construction pipeline.

Cluster usage (north rule: "run via spark-submit --py-files"):

    cd /root/repo && zip -qr /tmp/search_spark.zip search_spark
    spark-submit --master <cluster> --py-files /tmp/search_spark.zip \
        tools/run_pipeline.py --input <web_pages table/path> \
        --output /data/kg_triples [--no-link] [--ner-scoring]

Local smoke:

    spark-submit --master 'local[8]' --py-files /tmp/search_spark.zip \
        tools/run_pipeline.py --synthetic 500 --output /tmp/kg_out

Reads the web_pages table (parquet path; Iceberg identifier works the same
via ``spark.read.table``), runs extract → segment → NER → relations → link
→ canonicalize → materialize into a snapshot table with anti-join resume
and per-partition lineage, and prints the run's metrics JSON (docs/sec,
triples/sec, mentions/doc) — the north rule's per-run metrics row.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="web_pages parquet path or table name")
    ap.add_argument(
        "--input-format",
        choices=("auto", "parquet", "table", "warc"),
        default="auto",
        help="input container: parquet path, catalog table, or a directory "
             "of WARC archives (*.warc / *.warc.gz; lang is derived "
             "JVM-side since raw crawls don't carry it). auto = warc when "
             "the path mentions .warc, else parquet for paths / table for "
             "names",
    )
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True, help="snapshot table root")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--no-link", action="store_true")
    ap.add_argument("--no-canonicalize", action="store_true")
    ap.add_argument("--ner-scoring", action="store_true",
                    help="run the batched model pass over sentence windows")
    ap.add_argument("--write-tables", action="store_true",
                    help="also persist articles/paragraphs/sentences parquet "
                         "tables under <output>/tables/ (the reference's "
                         "create_database articles+sentences DB, "
                         "entrypoint/database/add.py:156-194)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit provides master/conf; fall back to the tuned local session
    spark = SparkSession.getActiveSession()
    if spark is None:
        try:
            from search_spark.session import get_spark
        except ImportError:  # running without --py-files, repo checkout only
            sys.path.insert(0, ".")
            from search_spark.session import get_spark
        spark = get_spark("run-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, run_to_snapshot

    if args.synthetic:
        pages = datagen.generate_web_pages(spark, args.synthetic, seed=42)
    elif args.input:
        fmt = args.input_format
        if fmt == "auto":
            if ".warc" in args.input:
                fmt = "warc"
            else:
                fmt = "parquet" if "/" in args.input else "table"
        if fmt == "warc":
            from search_spark.io.warc import derive_lang, read_warc

            path = args.input
            if not path.rstrip("/").endswith((".warc", ".warc.gz")):
                path = path.rstrip("/") + "/*.warc*"
            pages = derive_lang(read_warc(spark, path))
        elif fmt == "parquet":
            pages = spark.read.parquet(args.input)
        else:
            pages = spark.read.table(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    cfg = PipelineConfig(
        link=not args.no_link,
        canonicalize=not args.no_canonicalize,
        ner_scoring=args.ner_scoring,
    )
    metrics = run_to_snapshot(
        spark, pages, args.output, cfg, n_buckets=args.n_buckets
    )

    if args.write_tables:
        from pyspark.sql import functions as F

        from search_spark.extraction.extract import extract_stage
        from search_spark.extraction.metadata import articles_stage
        from search_spark.operators.segment import segment_stage

        root = args.output.rstrip("/") + "/tables"
        paragraphs = extract_stage(pages, english_only=cfg.english_only)
        paragraphs.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(args.n_buckets))
        ).write.partitionBy("bucket").mode("overwrite").parquet(
            f"{root}/paragraphs"
        )
        segment_stage(
            spark.read.option("basePath", f"{root}/paragraphs").parquet(
                f"{root}/paragraphs"
            ).drop("bucket")
        ).write.mode("overwrite").parquet(f"{root}/sentences")
        articles_stage(pages).write.mode("overwrite").parquet(
            f"{root}/articles"
        )
        metrics["tables"] = {
            t: spark.read.parquet(f"{root}/{t}").count()
            for t in ("paragraphs", "sentences", "articles")
        }

    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
