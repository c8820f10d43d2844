"""Table source/sink dispatch: Iceberg catalogs when configured, parquet
paths otherwise.

The north rule targets Iceberg tables of Common-Crawl-style pages
(BASELINE.json: north_rule).  This sandbox ships no Iceberg runtime jar,
so the driver's testdata is plain parquet — the engine reads EITHER
transparently: a dotted table identifier resolves through the session
catalog (Iceberg/DSv2: predicate pushdown, partition pruning, snapshot
reads all come through the same DataFrame scan interface parquet uses),
a path reads parquet.  Every operator takes DataFrames, so nothing else
in the engine cares which one fed it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_identifier(source: str) -> bool:
    """Dotted, slash-free, not parquet-suffixed → catalog table name."""
    return (
        "/" not in source
        and "\\" not in source
        and not source.endswith(".parquet")
        and "." in source
    )


def iceberg_configured(spark: SparkSession, catalog: str | None = None) -> bool:
    """True if an Iceberg (or any DSv2) catalog is configured on the
    session — i.e. some ``spark.sql.catalog.<name>`` conf key exists.

    Reads RuntimeConfig (not the JVM SparkConf snapshot) so catalogs
    registered after session creation — the standard notebook flow — are
    seen; a specific ``catalog`` is matched on the exact key, not a name
    prefix (``ice`` must not match ``iceberg_other``)."""
    if catalog:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    prefix = "spark.sql.catalog."
    runtime = {k for k, _ in spark.sparkContext.getConf().getAll()}
    try:  # RuntimeConfig covers post-creation spark.conf.set(...) keys
        runtime |= set(spark.conf.getAll)  # pyspark>=3.4 property
    except Exception:
        pass
    return any(k.startswith(prefix) for k in runtime)


def read_table(spark: SparkSession, source: str, fmt: str = "auto") -> DataFrame:
    """Read ``source`` as a DataFrame.

    ``fmt='auto'``: dotted identifiers go through ``spark.read.table``
    (Iceberg et al.), anything else through ``spark.read.parquet``.
    Explicit ``fmt='table'`` / ``fmt='parquet'`` forces the branch.
    """
    if fmt == "table" or (fmt == "auto" and is_table_identifier(source)):
        return spark.read.table(source)
    return spark.read.parquet(source)


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "auto",
    partition_by: tuple = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to a catalog table through the DSv2 writer (Iceberg's
    transactional path: ``mode='overwrite'`` → createOrReplace,
    ``mode='append'`` → append) or a parquet path."""
    if fmt == "table" or (fmt == "auto" and is_table_identifier(target)):
        w = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            w.append()
        elif mode == "overwrite":
            w.createOrReplace()
        else:
            raise ValueError(f"unsupported mode {mode!r} for table targets")
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
