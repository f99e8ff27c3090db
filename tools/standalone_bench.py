"""TRUE multi-executor scaling evidence (north rule: N -> 4N executors).

local[N] shares one JVM; this harness instead stands up a real Spark
standalone cluster on this box — one master + N worker daemons, one
executor per worker — and runs the extraction job via
spark-submit --master spark://... --py-files at N=2 and N=8 executors
(4 cores each: 8 vs 32 cores total, genuine cross-executor shuffle over
the loopback). Usage: python tools/standalone_bench.py [corpus_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
CORES_PER_EXEC = 4
LOGS = "/tmp/spark_standalone"


def _daemon(cmd, env):
    return subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)


def start_cluster(n_workers: int):
    env = dict(os.environ,
               SPARK_LOG_DIR=LOGS, SPARK_PID_DIR=LOGS,
               SPARK_LOCAL_IP="127.0.0.1", SPARK_MASTER_HOST="127.0.0.1",
               SPARK_NO_DAEMONIZE="1",
               SPARK_LOCAL_DIRS=os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                                               "/dev/shm/eynollah_spark_tmp"))
    os.makedirs(LOGS, exist_ok=True)
    procs = [_daemon([f"{SPARK_HOME}/bin/spark-class",
                      "org.apache.spark.deploy.master.Master",
                      "--host", "127.0.0.1", "--port", "7077",
                      "--webui-port", "18080"], env)]
    time.sleep(4)
    for i in range(n_workers):
        procs.append(_daemon(
            [f"{SPARK_HOME}/bin/spark-class",
             "org.apache.spark.deploy.worker.Worker", MASTER_URL,
             "--cores", str(CORES_PER_EXEC), "--memory", "10g",
             "--webui-port", str(18100 + i)], env))
    time.sleep(6)
    return procs


def stop_cluster(procs):
    for p in reversed(procs):
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=15)
        except Exception:
            p.kill()


def run_level(n_workers: int, corpus: str, zip_path: str,
              presorted: bool = False) -> dict:
    procs = start_cluster(n_workers)
    try:
        worker = os.path.join(REPO, "eynollah_spark", "bench_worker.py")
        cmd = [f"{SPARK_HOME}/bin/spark-submit",
               "--master", MASTER_URL,
               "--deploy-mode", "client",
               "--driver-memory", "8g",
               "--conf", "spark.executor.cores=%d" % CORES_PER_EXEC,
               "--conf", "spark.executor.memory=8g",
               "--conf", "spark.cores.max=%d" % (n_workers * CORES_PER_EXEC),
               "--conf", "spark.sql.shuffle.partitions=%d" % (n_workers * CORES_PER_EXEC),
               "--py-files", zip_path, worker,
               "--cpus", str(n_workers * CORES_PER_EXEC),
               "--corpus", corpus, "--trials", "3"]
        if presorted:
            cmd.append("--presorted")
        env = dict(os.environ, PYTHONPATH=REPO, EYNOLLAH_SPARK_REPO=REPO,
                   SPARK_LOCAL_IP="127.0.0.1")
        p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
        for line in p.stdout.splitlines():
            if line.startswith("BENCH_WORKER "):
                return json.loads(line[len("BENCH_WORKER "):])
        raise RuntimeError(p.stdout[-1500:] + p.stderr[-2500:])
    finally:
        stop_cluster(procs)


def main():
    """2/4/8-executor curve (r2 VERDICT item 1b), both the shuffled
    standard path and the bucketed task-side-scan path."""
    corpus = sys.argv[1] if len(sys.argv) > 1 else None
    if corpus is None:
        from bench import ensure_corpus
        corpus = ensure_corpus(int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000")))
    from eynollah_spark.packaging import build_zip
    zip_path = build_zip()
    curve, curve_pre, walls, checks = {}, {}, {}, []
    for n in (2, 4, 8):
        r = run_level(n, corpus, zip_path)
        rp = run_level(n, corpus, zip_path, presorted=True)
        curve[n] = r["docs_per_sec"]
        curve_pre[n] = rp["docs_per_sec"]
        walls[n] = {"standard": r.get("extract_trials_sec"),
                    "bucketed": rp.get("extract_trials_sec")}
        checks += [r["checksum"], rp["checksum"]]
    eff = round((curve[8] / curve[2]) / 4, 3)
    eff_pre = round((curve_pre[8] / curve_pre[2]) / 4, 3)
    # Name the limiter (VERDICT r4 item 4): run the no-Spark e2e
    # multiprocessing control at the same core counts IN THIS WINDOW —
    # if the control's own 8→32-core efficiency matches the cluster
    # curve's, the ceiling is the box (one machine's memory bandwidth +
    # co-tenant steal shared by all executors), not Spark's
    # cross-executor layer; if the control scales markedly better, the
    # deficit is Spark-side and needs profiling.
    from bench import e2e_control
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    ctl = e2e_control((2 * CORES_PER_EXEC, 8 * CORES_PER_EXEC), corpus,
                      n_docs, trials=2)
    ctl_lo, ctl_hi = ctl[2 * CORES_PER_EXEC], ctl[8 * CORES_PER_EXEC]
    ctl_eff = round((ctl_hi / ctl_lo) / 4, 3)
    norm = round(eff_pre / ctl_eff, 3) if ctl_eff else None
    if norm is not None and norm >= 0.9:
        limiter = ("single-box ceiling: all executors share one machine's "
                   f"memory bandwidth + co-tenant steal — the no-Spark control "
                   f"hit the same wall (control eff {ctl_eff}, cluster/control "
                   f"= {norm}); on a real cluster each node brings its own "
                   "bandwidth and the only cross-node stage is one hash shuffle")
    else:
        limiter = (f"Spark-side deficit: cluster eff {eff_pre} vs control "
                   f"{ctl_eff} in the same window (ratio {norm}) — "
                   "cross-executor layer needs profiling")
    res = {"mode": "standalone-cluster", "cores_per_executor": CORES_PER_EXEC,
           "curve_docs_per_sec": curve, "curve_bucketed_docs_per_sec": curve_pre,
           "walls": walls,
           "checksum_match": len(set(checks)) == 1,
           "scaling_efficiency_2_to_8": eff,
           "scaling_efficiency_bucketed_2_to_8": eff_pre,
           "e2e_control_docs_per_sec": {str(k): v for k, v in ctl.items()},
           "e2e_control_efficiency_same_window": ctl_eff,
           "control_normalized_bucketed": norm,
           "limiter": limiter,
           # kept for older BENCH.md renderers
           "executors_lo": 2, "executors_hi": 8,
           "docs_per_sec_2exec": curve[2], "docs_per_sec_8exec": curve[8],
           "walls_lo": walls[2]["standard"], "walls_hi": walls[8]["standard"],
           "scaling_efficiency": eff}
    print(json.dumps(res))
    with open(os.path.join(REPO, ".cache", "standalone_bench.json"), "w") as f:
        f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
