"""Python-worker daemon with heavy imports preloaded before the fork.

Stock ``pyspark.daemon`` forks a fresh worker per task slot; each worker
then imports pandas/pyarrow and this package on its first task — ~0.5 s
of CPU (and cold-page-cache disk) *per worker*, paid simultaneously by
every core the first time a Python stage runs.  Pointing
``spark.python.daemon.module`` here (see ``session.build_session``)
moves those imports — and the extractor model build — into the daemon
process, so forked workers inherit them copy-on-write: the import storm
happens once per executor instead of once per core.

This is the documented PySpark extension point (``python/pyspark/
daemon.py`` resolves the worker module the same way for any daemon
module), and the win *grows* with executor core count — it is a
cluster-shape optimization, not a local-mode trick.

Every preload is best-effort: a failure here must degrade to the stock
daemon behaviour (workers import lazily as before), never break the
Python runner.
"""

from __future__ import annotations

# NB: pyspark.daemon's module body resolves the worker entry point from
# sys.argv, which `python -m <this module> [worker_module]` passes
# through unchanged — import it first so that resolution is identical
# to the stock daemon.
import pyspark.daemon as _daemon

try:  # the Arrow runner stack (mapInPandas / pandas UDFs)
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
except Exception:  # noqa: BLE001 — degrade to lazy per-worker imports
    pass

try:  # this package's executor-side modules + the extractor singleton
    from ollie_spark.spark import corpus as _corpus  # noqa: F401
    from ollie_spark.spark.pipeline import _get_ollie

    _get_ollie()  # model + matchers built once, shared COW by workers
except Exception:  # noqa: BLE001
    pass


if __name__ == "__main__":
    _daemon.manager()
