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
    """Token count under the BPE-ish regex pre-tokenizer
    (``regexp_count`` — no match-array materialization)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def punct_count(text: Column) -> Column:
    """Sentence-punctuation count via ``translate`` (char-table lookup;
    same count as a regex scan at a fraction of the cost)."""
    return F.length(text) - F.length(F.translate(text, ".,!?;:", ""))


def _stopword_pattern(lang: str) -> str:
    """Regex matching a whole whitespace-delimited stopword token:
    ``(?:^|\\s)(?:w1|w2|…)(?=\\s|$)``.  The lookahead keeps adjacent
    stopwords ("of the") countable — equivalent to exact token
    equality over a ``\\s+`` split, without building the token array."""
    import re as _re

    words = "|".join(_re.escape(w) for w in STOPWORDS[lang])
    return rf"(?:^|\s)(?:{words})(?=\s|$)"


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``.

    One ``regexp_count`` pass — measured ~6× faster than filtering the
    token array with an interpreted higher-order lambda (sf0.1)."""
    hits = F.regexp_count(F.lower(F.trim(text)), F.lit(_stopword_pattern(lang)))
    return hits.cast("double") / ws_token_count(text)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score.

    score = 0.4·min(tokens/100,1) + 0.3·(1 − punct_ratio) +
            0.3·stopword_en_ratio   (each term ∈ [0,1])

    Two projections: the first computes each (regex/HOF) count exactly
    once; the second derives ratios and the composite score from the
    count columns.  The ratio/score expressions reference the counts
    2–3 times — inlining them would re-run the tokenizers per
    reference (interpreted HOF lambdas sit outside codegen CSE).
    """
    t = F.col(text_col)
    counts = df.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        ws_token_count(t).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
        punct_count(t).cast("long").alias("n_punct"),
        F.regexp_count(
            F.lower(F.trim(t)), F.lit(_stopword_pattern("en"))
        )
        .cast("long")
        .alias("n_stop"),
    )
    # Every ratio/score here is a RATIONAL of integer counts, and the
    # corpus systematically lands them on exact .00005 boundaries —
    # where engines' double round() implementations disagree.  So the
    # 4-decimal rounding happens in INTEGER arithmetic (half-up:
    # round(x/y) = (2x+y) div (2y)), bit-identical on any engine, and
    # only the final /10000.0 returns to double.
    #   score = 0.4·min(t,100)/100 + 0.3·(c−p)/c + 0.3·s/t
    #   score·10⁴ = (40·m·c·t + 3000·(c−p)·t + 3000·s·c) / (c·t)
    return counts.selectExpr(
        "doc_id",
        "n_chars",
        "n_ws_tokens",
        "n_bpe_tokens",
        "((2*10000*n_punct + n_chars) div (2*nullif(n_chars, 0)))"
        " / 10000.0D AS punct_ratio",
        "((2*10000*n_stop + n_ws_tokens) div (2*nullif(n_ws_tokens, 0)))"
        " / 10000.0D AS stopword_ratio",
        "((2*(40*least(n_ws_tokens, 100)*n_chars*n_ws_tokens"
        "     + 3000*(n_chars - n_punct)*n_ws_tokens"
        "     + 3000*n_stop*n_chars)"
        "  + n_chars*n_ws_tokens)"
        " div (2*nullif(n_chars*n_ws_tokens, 0))) / 10000.0D"
        " AS quality_score",
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc stopword-overlap score for every candidate language.

    The lowered text and token count are staged once; each language is
    one ``regexp_count`` over the staged string."""
    staged = df.withColumn(
        "_lc", F.lower(F.trim(F.col(text_col)))
    ).withColumn("_ntok", ws_token_count(F.col(text_col)).cast("long"))
    out = staged
    for lang in sorted(STOPWORDS):
        # Integer-exact 4-decimal rounding (see quality_features): the
        # hits/ntok rational hits .00005 boundaries where double
        # round() differs across engines.
        hits = F.regexp_count("_lc", F.lit(_stopword_pattern(lang))).cast(
            "long"
        )
        out = out.withColumn(f"_hits_{lang}", hits).withColumn(
            f"score_{lang}",
            F.expr(
                f"((2*10000*_hits_{lang} + _ntok)"
                " div (2*nullif(_ntok, 0))) / 10000.0D"
            ),
        ).drop(f"_hits_{lang}")
    return out.drop("_lc", "_ntok")


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


def tokens_col(text: Column) -> Column:
    """Canonical whitespace tokenization (lowered) — shared by tf-idf /
    n-grams so the DuckDB oracle can reproduce it with
    ``string_split_regex(lower(trim(text)), '\\s+')``."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def ngrams_col(text: Column, n: int = 2) -> Column:
    """Word n-grams as an array expression (the ``NGram``-transformer
    equivalent, SURVEY.md §2.2 text row) — built narrow inside the scan
    stage: no explode, no shuffle, no UDF.  Docs with fewer than ``n``
    tokens yield an empty array.

    Built by ``zip_with``-folding ``n`` shifted ``slice``\\ s of the
    token array (the `operators/dedup.hashed_shingles_col` idiom):
    the tokenizer subtree is evaluated O(n) times per document.  The
    previous ``transform(sequence(...), i -> array_join(slice(toks,
    i, n)))`` form re-evaluated the WHOLE ``split`` per gram position
    — interpreted HOF lambdas re-evaluate non-attribute children per
    element, so a g-gram document paid g full tokenizations
    (O(tokens²) per doc; measured 3.7 s → sub-second on t07 at
    sf0.1, same output)."""
    toks = tokens_col(text)
    m = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def tfidf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, term) tf-idf over the corpus (SURVEY.md §2.2 names the
    HashingTF+IDF shape; this is the exact document-frequency join form,
    so it is oracle-checkable).

    ``tfidf = tf · (ln((N + 1) / (df + 1)) + 1)`` (smoothed idf).

    100 TB shape: one shuffle to aggregate tf per (doc, term); document
    frequency derives from the tf table (already one row per doc-term,
    so df = count per term — no second pass over raw text); the df
    table is |vocab|-sized and broadcast back onto tf.  Corpus size N
    rides along as a scalar subquery, not a driver-side collect.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    # tf feeds both the document-frequency aggregate and the final
    # join; recomputing the narrow tokenize+count branch is cheaper
    # than materializing it (measured: .cache() here is ~4× slower at
    # sf0.1 — the pipeline is scan+explode+partial-agg, all in codegen).
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * idf).alias("tfidf"),
        )
    )


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
