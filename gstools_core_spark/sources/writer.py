"""Cell-prefix partitioned parquet writes (the engine's table layout).

At 100 TB the pages table is laid out by a coarse spatial prefix so that
spatial queries prune partitions at the scan: ``cell_prefix`` is the Morton
cell at a coarse resolution (parent prefix of the fine index), written as a
physical partition column.  Readers filtering on cell_prefix get partition
pruning for free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gstools_core_spark.functions import cells as C


def write_partitioned_by_cell(
    df: DataFrame,
    out_path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    prefix_res: int = 3,
) -> None:
    """Write parquet partitioned by the coarse Morton cell prefix."""
    out = df.withColumn(
        "cell_prefix", C.geo_cell_col(F.col(lat_col), F.col(lon_col), prefix_res)
    )
    out.write.mode("overwrite").partitionBy("cell_prefix").parquet(out_path)


def read_cells(
    spark: SparkSession, path: str, prefixes: list[int] | None = None
) -> DataFrame:
    """Read back, optionally pruned to a set of coarse cells (partition
    pruning — no data files outside the requested prefixes are touched)."""
    df = spark.read.parquet(path)
    if prefixes is not None:
        df = df.where(F.col("cell_prefix").isin([int(p) for p in prefixes]))
    return df


def write_bucketed_cells(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Bucketed (+ in-bucket sorted) parquet table keyed by the cell columns.

    The 100-TB co-location layout: a table bucketed on its blocking-cell
    key is ALREADY hash-partitioned on the join/grouping key at rest, so
    every downstream equi-join against another table bucketed the same way
    (cond vs targets, pages vs pages for the pair join's build side) and
    every ``groupBy(cell)`` aggregation runs with ZERO Exchange — the
    dominant shuffle of the kriging/variogram pipeline is paid once at
    write time and amortized over every subsequent query.  ``sort=True``
    additionally persists in-bucket order so sort-merge joins skip their
    Sort.  Plan-pinned by tests/test_storage.py::
    test_bucketed_join_and_agg_have_no_exchange.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)
