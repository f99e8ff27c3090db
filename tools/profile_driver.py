"""Run profile_scaling.py at two parallelism levels (own JVMs, pinned
cores, spark-submit --py-files) and print the stage-by-stage scaling table."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cpus, corpus, extra=()):
    from eynollah_spark.packaging import build_zip

    zip_path = build_zip()
    worker = os.path.join(REPO, "tools", "profile_scaling.py")
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    # split extras: --subconf k=v go to spark-submit --conf, rest to worker
    extra = list(extra)
    subconf, wargs = [], []
    i = 0
    while i < len(extra):
        if extra[i] == "--subconf":
            subconf += ["--conf", extra[i + 1]]
            i += 2
        else:
            wargs.append(extra[i])
            i += 1
    cmd = [spark_submit, "--master", f"local[{cpus}]",
           "--driver-memory", "16g"] + subconf + ["--py-files", zip_path, worker,
           "--cpus", str(cpus), "--corpus", corpus] + wargs
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("PROF "):
            return json.loads(line[5:])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-3000:])


def main():
    corpus = sys.argv[1]
    extra = sys.argv[2:]
    lo = run(8, corpus, extra)
    hi = run(32, corpus, extra)
    keys = [k for k in lo if k not in ("cpus", "parts")]
    print(f"{'variant':<14}{'local[8]':>10}{'local[32]':>11}{'speedup':>9}{'eff':>7}")
    for k in keys:
        sp = lo[k] / hi[k] if hi[k] else float("nan")
        print(f"{k:<14}{lo[k]:>10}{hi[k]:>11}{sp:>9.2f}{sp / 4:>7.2f}")
    print(json.dumps({"lo": lo, "hi": hi}))


if __name__ == "__main__":
    main()
