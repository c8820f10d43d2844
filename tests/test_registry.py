"""Pin the query-registry contract the correctness driver depends on.

The driver checks at most 50 queries per round (observed: round 2's
52-entry registry produced a 50-entry CORRECTNESS file — the last two
names were silently unchecked).  The registry must therefore stay at
exactly 50 load-bearing entries, and each name must keep its oracle
status: a new query may only land by replacing/merging an old one.
"""

from __future__ import annotations

from gstools_core_spark.queries import registry

# the load-bearing gate set (order = driver check order)
EXPECTED = [
    "variogram_unstructured",
    "variogram_cressie",
    "variogram_haversine",
    "variogram_3d",
    "variogram_directional_3d",
    "variogram_directional",
    "variogram_directional_sep",
    "variogram_structured",
    "variogram_ma_structured",
    "variogram_multifield",
    "tile_assignment",
    "knn_join",
    "geo_knn",
    "point_in_polygon",
    "rasterize",
    "rasterize_median",
    "variogram_cloud",
    "krige_ordinary",
    "krige_small",
    "krige_knn_small",
    "cond_field_small",
    "krige_universal_small",
    "krige_geo_small",
    "krige_raster",
    "krige_raster_small",
    "summate",
    "summate_fourier",
    "summate_incompr",
    "dedup_exact",
    "ngram_jaccard_capped",
    "dedup_components",
    "minhash_dedup",
    "simhash_neardup",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "ann_cosine_topk",
    "embedding_neardup",
    "lsh_ann",
    "ivf_ann",
    "events_stats",
    "events_windowed",
    "seg_order_stats",
    "sessionization",
    "events_rollup",
    "customers_without_orders",
    "top_orders_per_segment",
    "source_stats",
    "multimodal_features",
]

# rows-only entries (no SQL-expressible oracle); everything else must
# carry a DuckDB oracle string
NO_ORACLE = {"krige_ordinary", "krige_raster"}


def test_registry_is_exactly_the_pinned_50():
    r = registry()
    assert list(r) == EXPECTED, (
        "registry changed — the driver checks at most 50 queries, so any "
        "addition must replace an existing entry (update EXPECTED "
        "deliberately)"
    )
    assert len(r) == 50


def test_registry_oracle_coverage():
    r = registry()
    for name, (fn, sql) in r.items():
        assert callable(fn), name
        if name in NO_ORACLE:
            assert sql is None, f"{name} gained an oracle — update NO_ORACLE"
        else:
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entrypoint_exposes_registry():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    o = mod.oracle_sql()
    assert list(q) == EXPECTED
    assert set(o) == set(EXPECTED) - NO_ORACLE


def test_entrypoint_entry_executes(spark):
    """The driver smoke-checks entry(spark) runs and yields ≥0 rows with a
    stable schema; pin that execution here so a registry edit can't break
    the flagship query without failing the suite."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry_exec", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.schema.simpleString() == (
        "struct<bin_id:bigint,lo:double,hi:double,gamma:double,counts:bigint>"
    )
    assert len(df.collect()) == 8
