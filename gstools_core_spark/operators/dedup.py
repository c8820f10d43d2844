"""Deduplication operators for the large-scale training-data pipeline layer.

All candidate generation is JVM-side (xxhash64, array ops, equi-joins on
bucket keys — never a cross join); Python appears only in the simhash UDF.
Scale shape: shingle→signature is a per-row map (no shuffle); candidate
pairing is an equi-join on (band, bucket) keys; verification touches only
candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# a large prime < 2^31 for the affine minhash family
_MH_PRIME = 2147483647


def exact_dedup(df: DataFrame, key_cols, id_col: str) -> DataFrame:
    """Keep one row (smallest id) per exact key; adds dup_count."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    cnt = Window.partitionBy(*key_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(cnt))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles_col(text: Column, k: int = 5) -> Column:
    """Distinct word-level k-shingles as an array<string> (JVM-side)."""
    tokens = F.split(text, " ")
    n = F.size(tokens)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", tokens)))
    )


def minhash_signature(
    df: DataFrame, text_col: str, num_hashes: int = 64, shingle_k: int = 5
) -> DataFrame:
    """Append ``shingles`` and a ``signature`` array<long> of length
    ``num_hashes``: sig_i = min over shingles of (a_i·h(s)+b_i) mod prime,
    with h = xxhash64 (JVM) folded into [0, prime)."""
    sh = shingles_col(F.col(text_col), shingle_k)
    base = df.withColumn("shingles", sh)
    hashed = F.transform(F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_PRIME)))
    base = base.withColumn("_sh_hash", hashed)
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_sh_hash"),
                    lambda h, i=i: F.pmod(
                        h * F.lit(2 * i + 1) + F.lit(7 * i + 3), F.lit(_MH_PRIME)
                    ),
                )
            )
            for i in range(num_hashes)
        ]
    )
    return base.withColumn("signature", sig).drop("_sh_hash")


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 8
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair
    (a < b).  One explode + one self equi-join on (band, bucket)."""
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("signature")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col(id_col).alias("a_id"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("b_id"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, sigs: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs → (a_id, b_id, jaccard)."""
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    joined = (
        candidates.join(sh.withColumnRenamed(id_col, "a_id").withColumnRenamed("shingles", "a_sh"), "a_id")
        .join(sh.withColumnRenamed(id_col, "b_id").withColumnRenamed("shingles", "b_sh"), "b_id")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup removal: a doc is dropped if it verifies ≥threshold Jaccard
    against any candidate with a smaller id (single-pass canonicalization —
    the standard web-dedup contract, not full connected components)."""
    # persist the signature table: the band self-join and the verify join
    # each read it from both sides — without this the (expensive) shingle +
    # signature expressions recompute 4×.  At warehouse scale this is the
    # materialized signatures table.
    sigs = minhash_signature(df, text_col, num_hashes, shingle_k).persist()
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    dups = (
        jaccard_verify(cands, sigs, id_col, threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return df.join(dups, id_col, "left_anti")


def simhash64(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over whitespace tokens, fully JVM-side:
    bit k of the hash = sign of Σ_tokens (2·bit_k(xxhash64(token)) − 1)."""
    tokens = F.split(F.col(text_col), " ")
    tok_hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _bit_sum(k: int):
        def merge(acc, h):
            return acc + F.shiftrightunsigned(h, k).bitwiseAND(F.lit(1)) * 2 - 1

        return F.aggregate(tok_hashes, F.lit(0).cast("long"), merge)

    bit_sums = [_bit_sum(k) for k in range(64)]
    sim = None
    for k, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, k)
        sim = term if sim is None else sim.bitwiseOR(term)
    return df.withColumn(out_col, sim)


def simhash_near_dups(
    df: DataFrame, id_col: str, sim_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming via 4-band blocking
    (a pair within distance 3 of 64 bits shares at least one 16-bit band —
    pigeonhole), then exact popcount verify → (a_id, b_id, hamming)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(sim_col), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bucket"),
            )
            for b in range(4)
        ]
    )
    keyed = (
        df.select(F.col(id_col), F.col(sim_col))
        .withColumn("_b", F.explode(bands))
        .select(id_col, sim_col, "_b.band", "_b.bucket")
        .persist()  # read from both sides of the band self-join
    )
    a = keyed.select(
        F.col(id_col).alias("a_id"), F.col(sim_col).alias("a_sim"), "band", "bucket"
    )
    b = keyed.select(
        F.col(id_col).alias("b_id"), F.col(sim_col).alias("b_sim"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle:
    explode shingles → self equi-join on shingle → per-pair intersection
    count → |A∪B| = |A|+|B|−|A∩B| (no cross join anywhere)."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("s")
    ).persist()  # read 3×: both join sides + per-doc sizes
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a_id"), "s")
    b = sh.select(F.col(id_col).alias("b_id"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a_id").withColumnRenamed("n_sh", "a_n"), "a_id")
        .join(sizes.withColumnRenamed(id_col, "b_id").withColumnRenamed("n_sh", "b_n"), "b_id")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("a_n") + F.col("b_n") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
