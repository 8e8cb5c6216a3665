"""spark-submit entry point for the CDC pipeline (north-rule run mode:
``spark-submit --py-files odibel_spark.zip tools/submit_job.py ...``).

Builds the dependency zip on demand and prints the exact submit
command, or — when invoked under spark-submit — runs the pipeline
against the given WAL directory until no more data is available.

Usage:
  python tools/submit_job.py --package          # build dist/odibel_spark.zip
  spark-submit --py-files dist/odibel_spark.zip tools/submit_job.py \
      --wal /path/to/wal --table /path/to/table --checkpoint /path/ckpt \
      [--buckets 64] [--merge-mode mor] [--continuous]

On a real cluster add the usual sizing flags
(``--num-executors N --executor-cores C --executor-memory G``); the
engine itself is agnostic — everything it needs ships in the zip.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_dir: str | None = None) -> str:
    """Package the library for --py-files (pure-python, no native deps)."""
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "odibel_spark.zip")
    pkg = os.path.join(REPO, "odibel_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, names in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for n in sorted(names):
                if n.endswith(".py"):
                    p = os.path.join(dirpath, n)
                    z.write(p, os.path.relpath(p, REPO))
    return zip_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--package", action="store_true", help="only build dist/odibel_spark.zip")
    ap.add_argument("--wal")
    ap.add_argument("--table")
    ap.add_argument("--checkpoint")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--merge-mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--write-salt", type=int, default=1)
    ap.add_argument("--continuous", action="store_true",
                    help="keep tailing (default: drain available then stop)")
    args = ap.parse_args()

    if args.package:
        print(build_zip())
        return
    if not (args.wal and args.table and args.checkpoint):
        ap.error("--wal, --table and --checkpoint are required to run")

    # under spark-submit the session already exists; standalone runs
    # fall back to the local factory
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            sys.path.insert(0, REPO)
            from odibel_spark import get_spark

            spark = get_spark("odibel-cdc-submit")
    except Exception:
        raise SystemExit("pyspark not importable — run under spark-submit or with pyspark installed")

    from odibel_spark.cdc import PipelineConfig, TranscriptCdcPipeline

    pipe = TranscriptCdcPipeline(
        spark,
        PipelineConfig(
            wal_dirs=[args.wal],
            table_root=args.table,
            checkpoint_dir=args.checkpoint,
            buckets=args.buckets,
            merge_mode=args.merge_mode,
            write_salt=args.write_salt,
        ),
    )
    if args.continuous:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        m = pipe.metrics().agg({"n_events": "sum"}).collect()[0][0]
        print(f"drained WAL: {m} events applied; table at {args.table}")


if __name__ == "__main__":
    main()
