"""Text analysis operators: tokenization stats, language-ID heuristic,
quality scoring, document fingerprinting.

All pure Spark SQL expressions (whole-stage codegen; zero Python in the
hot path).  Every operator has an exact DuckDB-SQL mirror in
``__spark_entry__.oracle_sql`` built from the same constants below —
the cross-engine hash primitive is
``webgraph_big_spark.functions.stable_long_hash`` (md5 prefix → long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from webgraph_big_spark.functions import stable_long_hash

# rolling-hash constants (mirrored in oracle SQL)
FP_BASE = 31
FP_MOD = 1_000_000_000_000_007

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "les", "et", "des", "un"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text (single-space split —
    identical to DuckDB ``string_split(lower(x), ' ')``)."""
    return F.split(F.lower(col), " ")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_uniq_tokens, n_chars)."""
    t = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_uniq_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def _stop_count(t: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(t, lambda x: x.isin(words))).cast("long")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, best_score): argmax stopword-hit count per
    language, ties broken by language code ascending (the CASE evaluates
    languages in sorted order with >=)."""
    t = tokens(F.col(text_col))
    scored = docs.select(
        F.col(id_col), *[_stop_count(t, lg).alias(f"s_{lg}") for lg in sorted(STOPWORDS)]
    )
    langs = sorted(STOPWORDS)
    pred = None
    for i, lg in enumerate(langs):
        rest = [F.col(f"s_{other}") for other in langs[i + 1 :]]
        cond = (
            F.col(f"s_{lg}") >= F.greatest(*rest)
            if len(rest) > 1
            else (F.col(f"s_{lg}") >= rest[0] if rest else F.lit(True))
        )
        branch = F.when(cond, F.lit(lg))
        pred = branch if pred is None else pred.when(cond, F.lit(lg))
    pred = pred.otherwise(F.lit(langs[-1]))
    return scored.select(
        id_col,
        pred.alias("lang_pred"),
        F.greatest(*[F.col(f"s_{lg}") for lg in langs]).alias("best_score"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", rnd: int = 9) -> DataFrame:
    """(doc_id, quality): deterministic blend of length saturation,
    stopword ratio and lexical diversity — the standard cheap pretraining
    quality features."""
    t = tokens(F.col(text_col))
    n = F.size(t).cast("double")
    stop = _stop_count(t, "en").cast("double")
    uniq = F.size(F.array_distinct(t)).cast("double")
    score = (
        F.lit(0.3) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * (stop / n)
        + F.lit(0.3) * (uniq / n)
    )
    # empty documents score 0, not NULL (guard the n=0 division)
    score = F.when(n == 0, F.lit(0.0)).otherwise(score)
    return docs.select(F.col(id_col), F.round(score, rnd).alias("quality"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp): order-sensitive rolling polynomial hash over token
    hashes — acc ← (acc·B + H(tok)) mod M.  A content fingerprint robust
    to whitespace-identical re-encodings; ``F.aggregate`` folds JVM-side."""
    t = tokens(F.col(text_col))
    fp = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + stable_long_hash(x)) % FP_MOD,
    )
    return docs.select(F.col(id_col), fp.alias("fp"))
