"""Text-analysis column functions for the training-data pipeline layer.

All hot-path functions are JVM-side column expressions (whole-stage codegen);
only the rolling-hash fingerprint needs a vectorized pandas UDF.  The
token-count/stopword formulas use length/replace arithmetic that evaluates
identically in Spark SQL and DuckDB, keeping them oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# marker stopwords per language for the n-gram/stopword lang-ID heuristic
LANG_MARKERS = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " la "),
    "es": (" el ", " y ", " de "),
    "pt": (" o ", " e ", " de "),
}


def occurrence_count(text: Column, needle: str) -> Column:
    """# of occurrences of ``needle`` via length arithmetic (portable SQL)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / F.lit(
        len(needle)
    )


def sql_occurrence_count(text: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"(length({text}) - length(replace({text}, '{esc}', ''))) / {len(needle)}"


def token_count(text: Column) -> Column:
    """Whitespace token count = spaces + 1 (single-space-delimited corpora)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("long")


def sql_token_count(text: str) -> str:
    return f"CAST(length({text}) - length(replace({text}, ' ', '')) + 1 AS BIGINT)"


def quality_score(text: Column) -> Column:
    """Heuristic quality ∈ [0,1]: mean token length band + 'the' stopword
    presence + alpha ratio.  Deterministic arithmetic only."""
    n_tok = token_count(text).cast("double")
    mean_tok_len = (F.length(text).cast("double") - (n_tok - 1)) / n_tok
    len_component = 1.0 - F.least(F.abs(mean_tok_len - 4.5) / 4.5, F.lit(1.0))
    stop_component = F.least(
        occurrence_count(text, " the ").cast("double") / (n_tok / 50.0 + 1.0),
        F.lit(1.0),
    )
    size_component = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    return (0.4 * len_component + 0.3 * stop_component + 0.3 * size_component)


def lang_id(text: Column) -> Column:
    """Marker-stopword argmax lang-ID; 'und' (undetermined) when all zero."""
    scores = {
        lang: sum([occurrence_count(text, m) for m in markers], F.lit(0.0))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # iterate in fixed order; first max wins (deterministic tie-break)
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


_POLY_P = np.uint64(1099511628211)
_POW_CACHE = np.cumprod(
    np.full(65536, _POLY_P, dtype=np.uint64), dtype=np.uint64
)  # P^1..P^65536 mod 2^64 (wraparound is the modulus)


@F.pandas_udf(LongType())
def fingerprint64(texts: pd.Series) -> pd.Series:
    """Deterministic 64-bit polynomial rolling hash over utf-8 bytes:
    h = Σ b_i · P^(n-i) mod 2^64 — numpy-vectorized over the byte axis
    (the one text op that genuinely needs Python)."""
    global _POW_CACHE
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            if not t:
                out[i] = np.uint64(0)
                continue
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if len(data) > len(_POW_CACHE):
                _POW_CACHE = np.cumprod(
                    np.full(2 * len(data), _POLY_P, dtype=np.uint64), dtype=np.uint64
                )
            # np.sum's pairwise order is safe ONLY because uint64 addition
            # mod 2^64 is associative — the DuckDB oracle's Horner fold
            # reaches the identical residue.  Do NOT imitate this for float
            # accumulations (CLAUDE.md: np.sum is pairwise; oracle folds
            # are sequential).
            out[i] = np.sum(data * _POW_CACHE[: len(data)][::-1], dtype=np.uint64)
    return pd.Series(out.view(np.int64))
