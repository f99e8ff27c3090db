"""Bench worker: one parallelism level per process (fresh JVM).

Launched by bench.py — preferably via spark-submit --py-files (the
north-rule packaging path) — measures extraction throughput over a
pre-generated corpus parquet and (optionally) headline query latencies.
Prints one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--corpus", default=None, help="flat corpus parquet path")
    ap.add_argument("--presorted", action="store_true", help="time the bucketed-input path instead")
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--sf-dir", default=None, help="run headline queries against this dir")
    ap.add_argument("--queries", default="", help="comma-separated query names")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from eynollah_spark.pipeline import extract_flat_input
    from eynollah_spark.session import build_session

    spark = build_session(app=f"bench_c{args.cpus}", cpus=args.cpus,
                          shuffle_partitions=max(8, args.cpus))
    result = {"cpus": args.cpus}

    if not args.corpus:
        flat = None
    if args.corpus:
        flat = spark.read.parquet(args.corpus)
        n_docs = flat.select("doc_id").distinct().count()
        n_spans = flat.count()

    # warm EVERY python worker (fork + numpy/pandas/kernel import is ~1-2s
    # per worker and must not pollute the steady-state measurement)
    def _warm(it):
        import eynollah_spark.kernels.layout  # noqa: F401
        for pdf in it:
            yield pdf

    spark.range(0, args.cpus * 8, 1, args.cpus * 8).mapInPandas(
        _warm, "id long").count()

    if args.corpus:
        kernel_partitions = args.cpus * 4  # small tasks -> scheduler absorbs skew

        def run_once():
            t0 = time.time()
            if args.presorted:
                # bucketed-table fast path: task-side columnar scan over
                # the file manifest (zero shuffle, zero JVM row re-encode)
                import glob

                from eynollah_spark.pipeline import extract_from_parquet_files
                files = sorted(glob.glob(os.path.join(args.corpus, "*.parquet")))
                out = extract_from_parquet_files(
                    spark, files, partitions=args.cpus * 8)
            else:
                out = extract_flat_input(flat, partitions=kernel_partitions)
            row = out.select(
                F.count("*").alias("rows"),
                F.expr("bit_xor(xxhash64(doc_id, ord, kind, offset))").alias("checksum"),
            ).first()
            return time.time() - t0, int(row["checksum"]), row["rows"]

        trials, checksum, rows = [], None, None
        for _ in range(args.trials):
            t, checksum, rows = run_once()
            trials.append(t)
        wall = min(trials)
        result.update({
            "n_docs": n_docs, "n_spans": n_spans,
            "extract_wall_sec": round(wall, 3),
            "extract_trials_sec": [round(t, 2) for t in trials],
            "docs_per_sec": round(n_docs / wall, 2),
            "spans_per_sec": round(n_spans / wall, 1),
            "out_rows": rows, "checksum": checksum,
        })


    if args.sf_dir and args.queries:
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        timings = {}
        for name in args.queries.split(","):
            name = name.strip()
            if name not in qs:
                continue
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            df.count()
            timings[name] = round(time.time() - t0, 3)
        result["queries"] = timings

    print("BENCH_WORKER " + json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
