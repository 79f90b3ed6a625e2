"""SparkSession construction with scale-appropriate defaults.

Tuned for the target execution model (many executors over bucketed
Iceberg/parquet tables): AQE on (runtime coalescing + skew-join
splitting), Arrow batches sized for the extraction UDF, and an explicit
shuffle-partition default the caller overrides per cluster size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _worker_pythonpath() -> str:
    """PYTHONPATH for python workers: this package's root first, then
    whatever the environment already carries (pyspark's own paths are
    merged in by the worker factory regardless)."""
    import ollie_spark
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.abspath(ollie_spark.__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    return f"{pkg_root}:{existing}" if existing else pkg_root


def build_session(app_name: str = "ollie-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(8, int(cpus) if cpus.isdigit() else 32)
    b = (SparkSession.builder
         .appName(app_name)
         .master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         # preloaded python-worker daemon: pandas/pyarrow + the
         # extractor model import once per executor (the daemon) and
         # are inherited copy-on-write by every forked worker, instead
         # of once per core (daemon_preload.py; the win scales with
         # cores per executor).  Opt-out knob for environments where
         # the package isn't importable by `python -m`.
         .config("spark.python.daemon.module",
                 os.environ.get("OLLIE_SPARK_PY_DAEMON",
                                "ollie_spark.spark.daemon_preload"))
         # the daemon module is imported by `python -m` in a fresh
         # process: ship this package's root on the worker PYTHONPATH
         # so the import works regardless of the driver's cwd (on a
         # cluster the package arrives via --py-files the same way)
         .config("spark.executorEnv.PYTHONPATH", _worker_pythonpath())
         .config("spark.driver.memory",
                 os.environ.get("OLLIE_SPARK_DRIVER_MEM", "8g"))
         .config("spark.ui.enabled", "false"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
