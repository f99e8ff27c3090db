#!/usr/bin/env python3
"""Round-6 optimization side-bench (guide §1.4): per-query noop-isolated
walls + explain("formatted") capture, WITHOUT touching the frozen
bench.py. Mirrors bench_worker's query methodology (df.count(), 2 calls
per query in one JVM: cold = call 1, warm = min) and additionally writes
plans to plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--tag before] [--queries a,b,c] [--plans-only]
                        [--trials 2]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = (
    "tpch_q1_pricing", "tpch_q3_topk", "dedup_ngram_jaccard",
    "dedup_simhash_neardup", "dedup_embedding_neardup", "dedup_exact",
    "dedup_boilerplate_chunks", "sim_topk_cosine", "sim_ann_topk",
    "events_sessionize", "events_hourly_window", "events_funnel",
    "ro_line_sort", "ro_subline_split", "multimodal_variant_cache",
    "extract_reading_order")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("EYNOLLAH_SPARK_REPO", REPO)

    import __spark_entry__ as entrymod
    from eynollah_spark.session import build_session

    spark = build_session(app="bench_extra", cpus=cpus,
                          shuffle_partitions=max(8, cpus))

    # warm python workers (same as bench_worker)
    def _warm(it):
        import eynollah_spark.kernels.layout  # noqa: F401
        for pdf in it:
            yield pdf

    spark.range(0, cpus * 8, 1, cpus * 8).mapInPandas(_warm, "id long").count()

    qs = entrymod.queries()
    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)
    timings, cold = {}, {}
    for name in args.queries.split(","):
        name = name.strip()
        if name not in qs:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.tag:
            import contextlib
            import io

            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.plans_only:
            continue
        walls = []
        for _trial in range(args.trials):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            walls.append(round(time.time() - t0, 3))
        cold[name] = walls[0]
        timings[name] = min(walls)
        print(f"  {name}: cold={walls[0]} warm={min(walls)} all={walls}",
              file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    out = {"sf_dir": sf_dir, "cpus": cpus, "queries": timings,
           "queries_cold": cold,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print("BENCH_EXTRA " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
