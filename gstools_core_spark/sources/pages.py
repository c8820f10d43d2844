"""Common-Crawl-style pages table: deterministic synthesis + geocoding.

Input shape per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Synthesis is fully DISTRIBUTED and deterministic — ``spark.range(n)`` plus
pure column expressions (no driver-side data, no RNG state): the same id
always yields the same page on any cluster size.  The lang distribution is
deliberately skewed (en-heavy) so the geocoded cells exercise hot-cell
handling (SURVEY.md §7 risks).

The geocoder is the north rule's deterministic ``(url, lang) → (lat, lon)``:
a lang-dependent region center plus an xxhash64(url)-derived offset — pure,
reproducible, engine-side (no network, no lookup service).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = (
    "data page web crawl index query spark shard tile cell merge join scan "
    "filter sort hash group window stream batch text token lang model field "
    "grid point cloud krige bin pair dist angle mode wave phase rank salt "
    "skew part block chunk byte row col map red sum min max avg"
).split()

# lang → (share ‰ cumulative, tld, region center lat/lon, spread degrees)
LANGS = [
    ("en", 55, "com", 39.0, -98.0, 22.0),
    ("de", 70, "de", 51.0, 10.0, 5.0),
    ("fr", 80, "fr", 47.0, 2.0, 5.0),
    ("es", 88, "es", 40.0, -4.0, 5.0),
    ("pt", 94, "br", -10.0, -55.0, 12.0),
    ("zh", 100, "cn", 35.0, 105.0, 15.0),
]


def _lang_col():
    bucket = F.pmod(F.xxhash64(F.col("id"), F.lit(101)), F.lit(100))
    out = None
    for lang, cum, *_ in LANGS:  # lowest matching cumulative bound wins
        cond = bucket < F.lit(cum)
        out = F.when(cond, F.lit(lang)) if out is None else out.when(cond, F.lit(lang))
    return out


def synthesize_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic pages table of ``n`` rows with a stable ``page_id``."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    words_arr = F.array(*[F.lit(w) for w in WORDS])
    n_words = 20 + F.pmod(F.col("id") * 7, F.lit(80))
    # word selection hashes (id, position) — a multiplicative mix like
    # id * 2654435761 THROWS under Spark 4 ANSI mode once id exceeds
    # 2^63 / 2654435761 ≈ 3.5e9, far below the engine's target row count;
    # xxhash64 never overflows and kills the old 48-word cyclic structure
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda k: F.element_at(
                words_arr,
                (F.pmod(F.xxhash64(F.col("id"), k), F.lit(len(WORDS))) + 1).cast("int"),
            ),
        ),
    )

    lang = _lang_col()
    tld_map = F.create_map(
        *[F.lit(v) for pair in [(l, t) for l, _, t, *_ in LANGS] for v in pair]
    )
    url = F.concat(
        F.lit("https://site"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(10000)).cast("string"),
        F.lit("."),
        tld_map[lang],
        F.lit("/p/"),
        F.col("id").cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.col("id") * 997, F.lit(31536000)))

    out = df.select(
        F.col("id").alias("page_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        lang.alias("lang"),
        text.alias("text"),
    )
    html = F.encode(
        F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")),
        "utf-8",
    )
    return out.select("page_id", "url", "warc_ts", html.alias("html"), "text", "lang")


def geocode(pages: DataFrame, url_col: str = "url", lang_col: str = "lang") -> DataFrame:
    """Append deterministic (lat, lon): lang-region center + hash offset.

    Pure column expressions → reproducible on any cluster; the same url/lang
    always lands in the same cell (tile-assignment exact-match requirement).
    """
    lat_map = F.create_map(*[F.lit(v) for l, _, _, la, lo, sp in LANGS for v in (l, la)])
    lon_map = F.create_map(*[F.lit(v) for l, _, _, la, lo, sp in LANGS for v in (l, lo)])
    spread_map = F.create_map(*[F.lit(v) for l, _, _, la, lo, sp in LANGS for v in (l, sp)])

    u1 = F.pmod(F.xxhash64(F.col(url_col), F.lit(1)), F.lit(200001)) / 200000.0 - 0.5
    u2 = F.pmod(F.xxhash64(F.col(url_col), F.lit(2)), F.lit(200001)) / 200000.0 - 0.5
    lat = lat_map[F.col(lang_col)] + u1 * 2.0 * spread_map[F.col(lang_col)]
    lon = lon_map[F.col(lang_col)] + u2 * 3.0 * spread_map[F.col(lang_col)]
    return pages.withColumn("lat", lat).withColumn("lon", lon)
