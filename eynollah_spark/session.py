"""SparkSession factory with the engine's standard knobs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir() -> str:
    d = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if d:
        return d
    # tmpfs if the box has it (see the shuffle-contention note below),
    # else fall back to the system tmp
    return "/dev/shm/eynollah_spark_tmp" if os.path.isdir("/dev/shm") else "/tmp"


def build_session(app="eynollah_spark", cpus: int | None = None,
                  shuffle_partitions: int | None = None, ui=False) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cpus)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # shuffle files on tmpfs: this box's /tmp sits on one virtual disk
        # and 32 concurrent shuffle writers contend on it (measured: the
        # repartition stage got SLOWER 8->32 cores on disk). On a real
        # cluster use node-local NVMe via SPARK_GRAFT_LOCAL_DIR.
        .config("spark.local.dir", _default_local_dir())
        .config("spark.ui.enabled", str(ui).lower())
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
