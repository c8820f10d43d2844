"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (AQE on, skew-join splitting,
Arrow batches for the pandas-UDF kernels) while remaining correct on
local[N]; see SURVEY.md §4.3.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One BLAS thread per Python worker: Spark supplies the parallelism; letting
# OpenBLAS spawn nproc threads in each of N workers (N×nproc threads total)
# destroys scaling (observed: local[32] slower than local[8] on numpy-heavy
# kernels).  Must be set before the JVM launches so pyspark workers inherit.
_BLAS_VARS = (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
    "NUMEXPR_NUM_THREADS",
)


def _pin_blas_threads() -> None:
    # force-set (not setdefault): an inherited OMP_NUM_THREADS=32 from a
    # shell/scheduler is exactly the oversubscription this must prevent
    for var in _BLAS_VARS:
        os.environ[var] = "1"


def get_session(
    app_name: str = "gstools-core-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    memory_gb: int = 16,
) -> SparkSession:
    _pin_blas_threads()
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime coalescing + skew-join splitting — the
        # first line of defense against hot H3 cells at cluster scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for every pandas UDF / applyInPandas kernel.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Keep timestamps deterministic regardless of machine TZ.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", f"{memory_gb}g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
