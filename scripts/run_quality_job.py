"""spark-submit entrypoint for the quality pipeline (north_star: "packaged
for spark-submit --py-files execution on multi-executor clusters").

Cluster:
    ZIP=$(python -c "from language_identification_spark.session import package_zip; print(package_zip())")
    spark-submit --py-files "$ZIP" \
        scripts/run_quality_job.py --input <pages dir or Iceberg id> \
        --output <dir> --lineage <dir> [--buckets 256]

Local smoke:
    python scripts/run_quality_job.py --input /tmp/pages --output /tmp/out \
        --lineage /tmp/lineage

Resumable: re-running after a kill processes only buckets without lineage
rows. The package zip is produced by
``language_identification_spark.session.package_zip()``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--train-split", default="train",
                    help="value of the `split` column to train on; '' = all rows")
    args = ap.parse_args()

    from language_identification_spark.pipeline.lineage import run_resumable
    from language_identification_spark.pipeline.quality import train_quality_models
    from language_identification_spark.session import get_spark

    spark = get_spark("quality_job")
    pages = spark.read.parquet(args.input)
    train = (
        pages.filter(f"split = '{args.train_split}'")
        if args.train_split and "split" in pages.columns
        else pages
    )
    models = train_quality_models(train.select("text", "lang"))
    processed = run_resumable(
        spark, pages, models, args.output, args.lineage, n_buckets=args.buckets
    )
    lineage = spark.read.parquet(args.lineage)
    total = lineage.count()
    print(
        f"processed {len(processed)} bucket(s) this run; "
        f"{total}/{args.buckets} buckets complete"
    )


if __name__ == "__main__":
    main()
