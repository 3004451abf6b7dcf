"""Text-analysis operators: token counting, quality scoring, language
identification, fingerprinting.

All column expressions — JVM-side, vectorized, zero Python per row.
These are the per-document feature extractors a training-data pipeline
runs over billions of docs, so they must pipeline inside the scan stage
(no shuffle, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish pre-tokenizer: word pieces OR single non-space punctuation.
BPE_ISH_PATTERN = r"\w+|[^\w\s]"

# Small per-language stopword lists for the n-gram/stopword heuristic
# language ID. Deliberately tiny — the operator's shape (token-set
# overlap scoring) is what matters; swap lists for real ones in prod.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "im", "ein"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "du", "est", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[.,!?;:]"), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return hits.cast("double") / F.size(toks)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score.

    score = 0.4·min(tokens/100,1) + 0.3·(1 − punct_ratio) +
            0.3·stopword_en_ratio   (each term ∈ [0,1])
    """
    t = F.col(text_col)
    n_tok = ws_token_count(t)
    n_char = F.length(t)
    punct_ratio = punct_count(t).cast("double") / n_char
    sw = stopword_ratio(t, "en")
    score = (
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - punct_ratio) * 0.3
        + sw * 0.3
    )
    return df.select(
        "doc_id",
        n_char.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(sw, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc stopword-overlap score for every candidate language."""
    out = df
    for lang in sorted(STOPWORDS):
        out = out.withColumn(
            f"score_{lang}", F.round(stopword_ratio(F.col(text_col), lang), 4)
        )
    return out


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword score (ties → last language
    in lexicographic order, deterministic)."""
    scored = lang_scores(df, text_col)
    candidates = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    return scored.withColumn("pred_lang", F.array_max(candidates)["lang"])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two content fingerprints per doc:

    * ``fp_md5`` — cryptographic-ish exact fingerprint (oracle-checkable).
    * ``fp_roll`` — polynomial rolling hash over token hashes,
      acc·31 + xxhash64(token) mod (2^31 − 1) — modular so it stays in
      long range under ANSI arithmetic; the cheap order-sensitive
      streaming fingerprint a dedup pre-pass would use.
    """
    m = F.lit(2147483647).cast("long")  # Mersenne prime 2^31 - 1
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    roll = F.aggregate(
        F.transform(toks, lambda t: F.xxhash64(t)),
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(31).cast("long") + F.pmod(h, m), m),
    )
    return df.withColumn("fp_md5", F.md5(F.col(text_col))).withColumn(
        "fp_roll", roll
    )
