"""Deduplication operators for large-scale training-data pipelines.

Four tiers, each a composition of built-in DataFrame ops (no Python in
the hot path):

* **Exact** — hash-groupBy on content. Shuffle is O(distinct docs);
  the md5/sha2 fingerprint (16/32 bytes) travels instead of the text.
* **MinHash + LSH** — shingle → per-seed min-hash signature → band →
  bucket equi-join. Candidate generation is an equi-join on
  (band_id, band_hash), so the shuffle matches only colliding docs —
  the O(n²) pair space is never materialized. The classic 100 TB
  near-dup design (Broder; used by most web-scale dedup pipelines).
* **SimHash** — 64-bit signed-projection fingerprint; candidates from
  16-bit chunk equality (pigeonhole: hamming ≤ 3 ⟹ one of four 16-bit
  chunks equal), verified with bit_count(xor).
* **N-gram Jaccard** — exact set overlap for verification / small
  candidate sets.

All hash functions are Spark's xxhash64 (JVM, codegen). Signatures are
engine-specific, so LSH outputs get rows-only driver checks; the exact
Jaccard verifier is SQL-expressible and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles_col(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array (JVM higher-order fns).

    Texts shorter than n tokens yield an empty array (slice(…, 1, m)
    with m ≤ 0 would otherwise be invalid).

    Built by ``zip_with``-folding ``n`` shifted ``slice``\\ s of the
    token array — same rationale as :func:`hashed_shingles_col`: the
    previous ``transform(sequence(...), i -> array_join(slice(tok, i,
    n)))`` form re-evaluated ``tok``'s whole subtree (typically the
    ``split`` tokenizer) per gram position, O(tokens²) per document
    when callers pass the tokenizer expression inline."""
    m = F.size(tok) - (n - 1)
    grams = F.slice(tok, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(tok, i + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(tok) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: one representative (min id) per distinct text.

    Returns (fp, n_copies, keeper). Group key is the md5 fingerprint so
    only 16 bytes shuffle per doc, not the document body.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper"),
        )
    )


def hashed_shingles_col(tok: Column, n: int = 3) -> Column:
    """Hashed word-n-gram shingles of a token array as
    ``array<bigint>``, entirely as array expressions — no explode, no
    shuffle, no per-doc window.

    xxhash64 each token once, then form each shingle hash from the n
    consecutive token hashes by ``arrays_zip``-ping n shifted
    ``slice``\\ s of the hash array and hashing each zipped struct
    (order-sensitive, ANSI-safe).  Zipping slices evaluates the
    token-hash array once per document; by contrast indexing with
    ``transform``+``element_at`` re-evaluates it per access —
    quadratic per document.  Texts shorter than n tokens yield an
    empty array.  Because this is a narrow per-row projection, shingle
    profiling costs ZERO shuffles at any scale (the earlier
    posexplode + ``lead``-window formulation shuffled every token row;
    ~15× slower measured at sf0.1).
    """
    hs = F.transform(tok, lambda t: F.xxhash64(t))
    width = F.greatest(F.size(hs) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(hs, j + 1, width) for j in range(n)])
    return F.transform(zipped, lambda s: F.xxhash64(*[s[str(j)] for j in range(n)]))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, shingles, sig): per-doc distinct hashed-shingle set + MinHash
    signature — shingle arrays built narrow, signatures by hash-agg.

    The shingle hashes come from :func:`hashed_shingles_col` (array
    expressions, zero shuffle), exploded to (id, s) rows; the k-th
    MinHash is the affine permutation h_k = (a_k·h + b_k) mod (2^31−1)
    over the shingle hash (classic universal-hash MinHash), computed as
    plain ``min`` aggregates — whole-stage-codegen scalar expressions,
    with map-side partial aggregation so the one shuffle carries ≈1 row
    per doc.  (The all-array alternative — ``array_min`` over 32
    ``transform`` lambdas — avoids even that shuffle but generates a
    far larger interpreted expression tree whose codegen compile time
    dominates single-pass runs; the explode+hash-agg form is faster
    end-to-end at sf0.1 and scales identically: per-doc independent,
    linear in executors.)  Docs shorter than ``shingle_n`` tokens are
    dropped by a cheap scan-level token-count predicate — do NOT filter
    on size(shingles) after the projection; pushdown inlines the filter
    and CollapseProject then re-evaluates the interpreted shingle
    pipeline per signature expression (~10× slower, measured).
    """
    m = 2147483647  # Mersenne prime 2^31 - 1
    rng = __import__("random").Random(42)
    a_consts = [rng.randrange(1, m) for _ in range(num_hashes)]
    b_consts = [rng.randrange(0, m) for _ in range(num_hashes)]

    rows = df.filter(F.size(tokens_col(F.col(text_col))) >= shingle_n).select(
        F.col(id_col).alias("id"),
        F.explode(
            hashed_shingles_col(tokens_col(F.col(text_col)), shingle_n)
        ).alias("s"),
    )
    # The k MinHash aggregates and the signature array are built as
    # SQL expr strings, not per-term Column algebra (r15, the r14
    # eab7e52 SWAR precedent): the Column form cost ~200 py4j round
    # trips of flat per-run driver time; each expr string parses to
    # the IDENTICAL analyzed tree JVM-side (pinned canonically in
    # tests/test_r15_opt.py), so plans and results are unchanged.
    prof = rows.groupBy("id").agg(
        F.collect_set("s").alias("shingles"),
        *[
            F.expr(f"min(pmod(pmod(s, {m}) * {a} + {b}, {m}))").alias(
                f"mh{k}"
            )
            for k, (a, b) in enumerate(zip(a_consts, b_consts))
        ],
    )
    sig = F.expr(
        "array({})".format(",".join(f"mh{k}" for k in range(num_hashes)))
    ).alias("sig")
    return prof.select("id", "shingles", sig)


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Banded-LSH candidate pairs from MinHash signatures.

    Explode each signature into ``bands`` (band_id, band_hash) buckets,
    self-join on bucket equality with id_a < id_b.  Shuffle volume is
    O(docs × bands); matches only within buckets — never O(n²).
    """
    # One expr string instead of bands x rows_per_band Column calls —
    # same analyzed tree, a fraction of the py4j round trips (r15;
    # canonical-tree pin in tests/test_r15_opt.py).
    structs = ",".join(
        "struct({b} as band_id, xxhash64({args}) as band_hash)".format(
            b=b,
            args=",".join(
                f"sig[{b * rows_per_band + r}]"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    banded = sig_df.select(
        "id",
        F.expr(f"explode(array({structs}))").alias("bucket"),
    ).select("id", "bucket.band_id", "bucket.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sig_df: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs: |∩| / |∪| of the
    distinct-shingle sets; keeps pairs ≥ threshold."""
    sh = sig_df.select("id", "shingles")
    j = (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    return (
        j.withColumn(
            "jaccard",
            F.round(inter.cast("double") / union, 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pipeline: signatures → banded
    candidates → exact Jaccard verify ≥ threshold.

    The per-doc profile (shingle set + signature, one aggregation —
    see :func:`minhash_signatures`) feeds three consumers: banding and
    both sides of the verify join.  Caching it avoids recomputing
    tokenize/shingle/aggregate; on a cluster this materialization
    would be a checkpoint/persist to cluster storage.
    """
    from kinesis_log_streamer_spark.operators.parallelize import spread_for_compute

    profiles = minhash_signatures(
        spread_for_compute(df.select(id_col, text_col)),
        text_col,
        id_col,
        num_hashes,
        shingle_n,
    ).cache()
    cands = lsh_candidate_pairs(profiles, bands, num_hashes // bands)
    return jaccard_verify(cands, profiles, threshold)


def simhash64(text_col_name: str) -> Column:
    """64-bit SimHash of a text column, fully JVM-side.

    One aggregate pass over the token-hash array builds 64 signed bit
    counters (zip_with against a 64-slot accumulator), then a second
    fold packs the counter signs into a 64-bit long.  Expressed as a
    single SQL higher-order expression so whole-stage codegen keeps it
    in the JVM — no Python per row.
    """
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(
              transform(split(lower(trim({text_col_name})), '\\\\s+'), tk -> xxhash64(tk)),
              array_repeat(0L, 64),
              (acc, h) -> zip_with(acc, sequence(0, 63),
                          (a, i) -> a + CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)
            ),
            sequence(0, 63),
            (c, i) -> CASE WHEN c > 0 THEN shiftleft(1L, i) ELSE 0L END
          ),
          0L, (acc, x) -> acc + x
        )
        """
    )


def _lane_guard(sig: Column) -> Column:
    """Fail-loud overflow guard for the SWAR SimHash aggregates.

    Both :func:`simhash_fingerprints` and :func:`_portable_simhash_sigs`
    pack per-bit counts into 16-bit lanes of long accumulators; the
    65,536th contributing token in one document would CARRY into the
    neighboring lane — silently flipping an unrelated majority-vote
    bit, not saturating (ADVICE r13 low #1).  The aggregates already
    compute the per-document token count ``n`` in the same pass, so
    the guard is one scalar predicate per OUTPUT row (|docs|, not
    |tokens|): ``assert_true`` raises on the first oversized document
    and returns NULL otherwise, which ``coalesce`` discards in favor
    of the signature.
    """
    msg = (
        "SimHash SWAR lanes are 16-bit: a document with >= 65536 "
        "contributing tokens would carry into the neighboring lane and "
        "corrupt unrelated signature bits; split the document (e.g. "
        "rag_chunks) before fingerprinting"
    )
    return F.coalesce(
        F.assert_true(F.col("n") < F.lit(65536), F.lit(msg)).cast("long"),
        sig,
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): 64-bit SimHash per document, computed on exploded
    token rows so the whole thing is whole-stage-codegen.

    SWAR-packed: instead of 64 per-bit counters, 16 ``sum`` aggregates
    each accumulate 4 bit-popcounts in 16-bit lanes of one long
    (mask 0x0001000100010001 after shifting the token hash right by the
    lane group).  Lane j of accumulator g is the number of tokens with
    bit g+16j set; the signed SimHash counter is 2·s − n, so bit b is
    set iff 2·s_b > n_tokens.  The final projection unpacks lanes and
    ORs the sign bits into one long.  16 narrow aggregates keep the
    aggregation inside whole-stage codegen (64 separate CASE-WHEN sums
    spill out of it); the shuffle carries |docs| × 17 longs.  Lane
    counts are 16-bit: a 65,536th token would CARRY into the
    neighboring lane (corrupting an unrelated bit's count, not
    saturating), so the final projection guards ``n < 2^16`` with
    ``assert_true`` — a document that large fails loudly instead of
    fingerprinting wrong (ADVICE r13 low #1).  Equivalent semantics to
    :func:`simhash64`, far faster than the interpreted
    higher-order-function form.
    """
    lane_mask = 0x0001000100010001
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    # Aggregates and the 64-term unpack are built as SQL strings (one
    # F.expr each) — the per-term Column algebra cost hundreds of py4j
    # round trips of flat per-plan-build driver time (r14; see
    # _portable_simhash_sigs).  The parsed trees are identical.
    counters = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(
                f"sum(shiftright(h, {g}) & {lane_mask}L)"
            ).alias(f"acc{g}")
            for g in range(16)
        ],
    )

    def _bit_sql(b: int) -> str:
        g, j = b % 16, b // 16
        return (
            f"(CASE WHEN (shiftright(acc{g}, {16 * j}) & 65535) * 2 > n "
            f"THEN shiftleft(CAST(1 AS BIGINT), {b}) "
            "ELSE CAST(0 AS BIGINT) END)"
        )

    packed = F.expr(" | ".join(_bit_sql(b) for b in range(64)))
    return counters.select("id", _lane_guard(packed).alias("simhash"))


def simhash_pairs(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ max_hamming.

    Candidates via the pigeonhole principle: split the 64-bit hash into
    4 × 16-bit chunks; any pair within hamming ≤ 3 must agree on at
    least one chunk, so an equi-join per chunk finds all of them with
    shuffle O(docs × 4) — no cross join.  Recall is exact for
    ``max_hamming`` ≤ 3; for larger radii the chunk filter is a
    high-recall heuristic (a pair may differ in all four chunks).

    Exactly ONE of ``df`` / ``fingerprints`` must be given (ADVICE r10
    low #4: accepting both silently ignored ``df``, so a caller
    passing a FILTERED frame plus a full-corpus index would get pairs
    outside its intended subset with no error).  The pair universe is
    always the fingerprint table's: pass ``fingerprints`` — a
    pre-built ``(id, simhash)`` table from
    :func:`simhash_fingerprints`, typically checkpointed or persisted
    — for the index-lifecycle shape: at 100 TB the fingerprint scan is
    built ONCE per corpus and every detection pass joins against it,
    exactly like the s15 IVF index table.  Pass ``df`` to compute (and
    cache in-plan) the fingerprints for precisely that frame.
    """
    from kinesis_log_streamer_spark.operators.parallelize import spread_for_compute

    if (df is None) == (fingerprints is None):
        raise ValueError(
            "simhash_pairs: pass exactly one of df / fingerprints — "
            "the pair universe is defined by whichever is given"
        )
    # Cache: the 64-bit fingerprint is consumed by both sides of the
    # chunk self-join; without it the fingerprint aggregation would
    # run twice.
    sh = (
        fingerprints
        if fingerprints is not None
        else simhash_fingerprints(
            spread_for_compute(df.select(id_col, text_col)),
            text_col,
            id_col,
        ).cache()
    )
    chunked = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("chunk_id"),
                        F.shiftrightunsigned("simhash", 16 * j)
                        .bitwiseAND(F.lit(65535))
                        .alias("chunk"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk_id", "c.chunk")
    a = chunked.alias("a")
    b = chunked.alias("b")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        # Verify BEFORE the duplicate-candidate dedup: hamming is a
        # cheap map-side bit op, so failing pairs never shuffle into
        # the distinct (a pair surfaced by up to 4 chunks otherwise
        # carries 4 rows through the exchange).
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _portable_band_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bands: int,
    rows_per_band: int,
    shingle_n: int,
):
    """(with_sh, bands) shared by the portable-MinHash pair and
    star-edge emitters: distinct shingle sets plus narrow
    (id, band, bkey) banding rows (one md5 per shingle split into
    hex lanes; see :func:`portable_minhash_pairs` for the family
    rationale)."""
    from kinesis_log_streamer_spark.operators.parallelize import spread_for_compute

    tok = tokens_col(F.col(text_col))
    lane_w = 32 // (n_bands * rows_per_band)
    if lane_w < 1:
        raise ValueError(
            f"n_bands * rows_per_band = {n_bands * rows_per_band} exceeds "
            "the 32 hex chars of one md5 digest: every lane substring "
            "would be empty, all band keys would collide, and the "
            "candidate join would degenerate to O(n^2)"
        )
    with_sh = (
        spread_for_compute(df.select(id_col, text_col))
        .filter(F.size(tok) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles_col(tok, shingle_n)).alias("sh"),
        )
    )
    # The digest array is materialized in its OWN projection: the six
    # lane mins below each reference it, and CollapseProject refuses
    # to inline a non-cheap multi-referenced alias, so md5 runs once
    # per shingle (verified against a fused-projection variant, which
    # recomputes it per lane).
    with_dig = with_sh.select(
        "id", "sh", F.transform("sh", lambda x: F.md5(x)).alias("dig")
    )

    def _minhash(lane: int) -> Column:
        return F.array_min(
            F.transform(
                "dig", lambda d: F.substring(d, 1 + lane_w * lane, lane_w)
            )
        )

    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.concat(
                *[
                    _minhash(i * rows_per_band + r)
                    for r in range(rows_per_band)
                ]
            ).alias("bkey"),
        )
        for i in range(n_bands)
    ]
    bands = with_dig.select(
        "id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    return with_sh, bands


def _jaccard_verified(cand: DataFrame, with_sh: DataFrame, threshold: float) -> DataFrame:
    """Exact string-shingle Jaccard >= threshold over candidate
    (id_a, id_b) pairs — the shared verify leg."""
    sa = with_sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = with_sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    return verified.filter(
        inter.cast("double") / union >= threshold
    ).select("id_a", "id_b")


def portable_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 3,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with an ENGINE-PORTABLE hash family.

    Same banded-bucket design as :func:`minhash_dedup_pairs`, but the
    hash family is ONE md5 per shingle split into hex-substring LANES
    — md5 produces identical lowercase hex in Spark and DuckDB and
    fixed-width hex substrings order lexicographically the same way,
    so the candidate set (not just the verified output) is
    reproducible across engines and the whole pipeline is
    oracle-checkable.  Lane j of a shingle is
    ``substr(md5(shingle), 1 + w*j, w)`` with
    ``w = 32 // (n_bands*rows_per_band)`` hex chars; disjoint
    substrings of one digest are independent uniform bits, so each
    lane behaves as its own hash function.  (r03 shipped
    ``min(md5(seed ':' shingle))`` per lane — 6 full digests per
    shingle made this the most CPU-per-byte operator in the repo and
    the dominant bench-variance term; the lane split keeps the exact
    same banding semantics at one digest per shingle.)  A lane
    collision between two shingles needs 16^w ≈ 1M (w=5) agreement
    and only matters if it lands at the min — a ≲1e-3 perturbation of
    the J^rows_per_band band-collision rate.  The xxhash64 variant
    (d02) stays the production default: one 64-bit integer JVM hash
    vs a 32-char string digest here.

    Shape per doc: ``n_bands`` (band, band-key) rows, where a band key
    concatenates ``rows_per_band`` independent min-hash lanes (P[key
    collision] = J^rows_per_band, so J=0.98 dups survive while J≈0.02
    background pairs almost never collide).  Candidates come from an
    equi-join on (band, key); exact Jaccard ≥ ``threshold`` verifies
    candidates only.  Zero O(n²) stage anywhere.

    Returns (id_a, id_b) verified pairs, id_a < id_b.
    """
    with_sh, bands = _portable_band_rows(
        df, text_col, id_col, n_bands, rows_per_band, shingle_n
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _jaccard_verified(cand, with_sh, threshold)


def portable_minhash_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 3,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Star-shaped near-dup EDGES for cluster building — the
    candidate-volume-bounded twin of :func:`portable_minhash_pairs`
    (VERDICT r9 #4).

    A connected-components build does not need every clique edge: a
    bucket of k colliding documents is spanned by the k-1 edges from
    each member to the bucket's min-id REPRESENTATIVE exactly as well
    as by its C(k,2) pairwise edges.  Replica-heavy corpora put all
    copies of one document in the same buckets, so clique candidate
    generation grows QUADRATICALLY in the duplication factor (the
    d05 SCALING bend: 982x true edge growth for 10x rows, replica
    10-cliques) while star generation grows linearly — candidate
    volume is O(docs x bands) at ANY duplication skew.

    Each star edge is still exact-Jaccard verified, so precision is
    identical to the pair emitter.  Components of verified-star edges
    are a refinement of verified-clique components in the adversarial
    corner (J(member, rep) < t <= J(member, other member)); on
    duplicate clusters — the workload this exists for — every member
    passes against the representative and the cluster output is
    unchanged (asserted across sf0.001/0.01/0.1; the DuckDB oracles
    mirror star generation verbatim, so the gate stays sound
    regardless).  NOT a drop-in for pair-set consumers (d19's recall
    gate, pair dumps): the output is a spanning edge set, not the
    near-dup pair relation.

    An EXACT-duplicate collapse runs first — the standard web-scale
    pipeline order (hash-dedup before MinHash): byte-identical texts
    are grouped on a 16-byte md5 fingerprint, each group contributes
    (group-rep → member) edges directly (J = 1 by construction, no
    verify needed), and only the group REPRESENTATIVES enter banding.
    The near-dup leg therefore scales with DISTINCT texts, not corpus
    rows — on a replica-10 corpus the banding/verify workload is
    constant while the exact leg is one linear hash-groupBy.
    Output-equivalence is provable, not just asserted: band keys and
    Jaccard are functions of the text alone, so identical-text docs
    share every bucket (connected in the doc-level build via J=1
    star edges) and the rep-level star graph is exactly the doc-level
    star graph's quotient by text equality — components coincide.
    The ≥ shingle_n token-eligibility filter applies BEFORE the exact
    collapse so short documents stay singletons, exactly as they are
    excluded from banding in the pair emitter.

    Returns (id_a, id_b) verified edges, id_a < id_b (id_a is an
    exact-group or bucket representative).
    """
    from kinesis_log_streamer_spark.operators.parallelize import spread_for_compute

    tok = tokens_col(F.col(text_col))
    eligible = (
        spread_for_compute(df.select(id_col, text_col))
        .filter(F.size(tok) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("txt"),
            F.md5(F.col(text_col)).alias("fp"),
        )
    )
    # One window-min over the fingerprint partition instead of a
    # groupBy + join-back: same rep assignment, half the shuffles
    # (the d22 stop-fingerprint guard precedent).
    from pyspark.sql.window import Window as _W

    mapping = eligible.withColumn(
        "rep", F.min("id").over(_W.partitionBy("fp"))
    )
    exact_edges = mapping.filter(F.col("id") != F.col("rep")).select(
        F.col("rep").alias("id_a"), F.col("id").alias("id_b")
    )
    rep_docs = mapping.filter(F.col("id") == F.col("rep")).select(
        F.col("id").alias(id_col), F.col("txt").alias(text_col)
    )
    with_sh, bands = _portable_band_rows(
        rep_docs, text_col, id_col, n_bands, rows_per_band, shingle_n
    )
    reps = bands.groupBy("band", "bkey").agg(F.min("id").alias("id_a"))
    cand = (
        bands.join(reps, ["band", "bkey"])
        .filter(F.col("id") > F.col("id_a"))
        .select("id_a", F.col("id").alias("id_b"))
        .distinct()
    )
    near_edges = _jaccard_verified(cand, with_sh, threshold)
    return exact_edges.unionByName(near_edges)


def portable_minhash_sweep(
    df: DataFrame,
    levels: tuple[int, ...] = (1, 2, 4),
    rows_per_band: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Band-count tuning sweep for :func:`portable_minhash_pairs` —
    the dedup twin of the ANN nprobe sweep: per band count n ∈
    ``levels``, how many candidate pairs LSH surfaces and how many
    survive exact-Jaccard verification.  Band sets are NESTED (level
    n uses bands 0..n−1 with the same lanes), so both counts are
    monotone non-decreasing in n — and because the md5 hex-lane hash
    family is engine-portable (one digest per shingle split into
    ``32 // (max_bands*rows_per_band)``-char lanes; see
    :func:`portable_minhash_pairs`), the COUNTS themselves (not just
    gates) are reproducible by an external engine.

    Cost: the banding/verification pipeline runs ONCE at max(levels);
    each pair carries its FIRST matching band, and level counts are
    filtered aggregates over that — not one pipeline per level.

    Returns (n_bands, n_candidates, n_verified) ordered by n_bands.
    """
    from kinesis_log_streamer_spark.operators.parallelize import (
        spread_for_compute,
    )

    max_bands = max(levels)
    tok = tokens_col(F.col(text_col))
    lane_w = 32 // (max_bands * rows_per_band)
    with_sh = (
        spread_for_compute(df.select(id_col, text_col))
        .filter(F.size(tok) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles_col(tok, shingle_n)).alias("sh"),
        )
    )
    with_dig = with_sh.select(
        "id", "sh", F.transform("sh", lambda x: F.md5(x)).alias("dig")
    )

    def _minhash(lane: int) -> Column:
        return F.array_min(
            F.transform(
                "dig", lambda d: F.substring(d, 1 + lane_w * lane, lane_w)
            )
        )

    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.concat(
                *[
                    _minhash(i * rows_per_band + r)
                    for r in range(rows_per_band)
                ]
            ).alias("bkey"),
        )
        for i in range(max_bands)
    ]
    bands = with_dig.select(
        "id", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.min("a.band").alias("first_band"))
    )
    sa = with_sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = with_sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    flagged = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "first_band",
            (inter.cast("double") / union >= threshold)
            .cast("int")
            .alias("ok"),
        )
    )
    spark = df.sparkSession
    lv = spark.createDataFrame(
        [(int(n),) for n in sorted(levels)], "n_bands int"
    )
    return (
        flagged.crossJoin(F.broadcast(lv))
        .groupBy("n_bands")
        .agg(
            F.count(F.when(F.col("first_band") < F.col("n_bands"), 1)).alias(
                "n_candidates"
            ),
            F.count(
                F.when(
                    (F.col("first_band") < F.col("n_bands"))
                    & (F.col("ok") == 1),
                    1,
                )
            ).alias("n_verified"),
        )
        .orderBy("n_bands")
    )


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def _portable_simhash_sigs(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, sig): the engine-portable 32-bit SimHash shared by
    :func:`portable_simhash_pairs` and
    :func:`portable_simhash_star_edges`.

    Signature bit i is the MAJORITY VOTE of the PARITY of hex char i
    across one md5 per DISTINCT token (ties → set, ``2·cnt ≥ n``) —
    md5 hex is identical in Spark and DuckDB, so the signature (and
    everything downstream: shift/mask banding, ``bit_count(xor)``
    hamming) replays exactly in the oracle SQL.

    Computed on EXPLODED token rows with SWAR-packed sums — the
    :func:`simhash_fingerprints` trick ported to the md5 family: the
    original 32 × ``F.aggregate`` higher-order lambdas were
    interpreted per array element AND re-analyzed per consumer branch
    (~2.4 s of flat per-query cost at ANY corpus size); here each
    exploded (id, md5) row contributes 8 longs whose four 16-bit
    lanes each carry one hex-parity bit, one hash aggregate sums
    them map-side, and a final projection unpacks lanes into the
    majority-vote bits.  Whole-stage codegen end to end; the shuffle
    carries |docs| × 9 longs.  Lane counts are 16-bit — a 65,536th
    distinct token would CARRY into the neighboring lane (corrupting
    an unrelated bit, not saturating), so the projection guards
    ``n < 2^16`` via :func:`_lane_guard` and fails loudly instead
    (ADVICE r13 low #1; same bound as simhash_fingerprints).  Bit i
    lives in lane ``i // 8`` of accumulator ``i % 8``.
    """
    from kinesis_log_streamer_spark.operators.parallelize import (
        spread_for_compute,
    )

    tok = tokens_col(F.col(text_col))
    base = (
        spread_for_compute(df.select(id_col, text_col))
        .filter(F.size(tok) >= 1)
        .select(
            F.col(id_col).alias("id"), F.array_distinct(tok).alias("t")
        )
    )
    toks = base.select("id", F.explode("t").alias("tk")).select(
        "id", F.md5("tk").alias("d")
    )

    # The packed-lane aggregates and the 32-term unpack are built as
    # SQL strings (ONE F.expr each) rather than per-term Column
    # algebra: the 32 CASE/substring/IN terms plus the 32 unpack
    # terms cost ~600 py4j round trips per plan BUILD — a measured
    # 1.5-2.5 s of flat driver-side cost per d03/d17/d24 run at any
    # corpus size (r14).  The parsed expression tree is identical.
    odd = ", ".join(f"'{h}'" for h in _ODD_HEX)

    def packed_sql(g: int) -> str:
        # Lane j of accumulator g: parity of hex char g + 8j.
        return " + ".join(
            f"(CASE WHEN substring(d, {g + 8 * j + 1}, 1) IN ({odd}) "
            f"THEN CAST({1 << (16 * j)} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
            for j in range(4)
        )

    counters = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.expr(f"sum({packed_sql(g)})").alias(f"acc{g}") for g in range(8)],
    )
    sig = F.expr(
        " + ".join(
            f"CAST((2 * (shiftright(acc{g}, {16 * j}) & 65535)) >= n "
            f"AS BIGINT) * CAST({1 << (g + 8 * j)} AS BIGINT)"
            for g in range(8)
            for j in range(4)
        )
    )
    return counters.select("id", _lane_guard(sig).alias("sig"))


def portable_simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with an ENGINE-PORTABLE hash family —
    the d03→d17 twin of the d02→d05 MinHash relationship.

    Production :func:`simhash_pairs` uses xxhash64 (JVM-only, rows-
    only check); the portable signature (:func:`_portable_simhash_sigs`)
    makes the ENTIRE pipeline replay in SQL so the exact pair set is
    oracle-hashed.

    Candidates via the pigeonhole principle: 4 × 8-bit chunks of the
    signature; any pair within hamming ≤ 3 must agree on ≥ 1 chunk,
    so four equi-joins reach EXACT recall (not LSH-probabilistic) at
    shuffle O(docs × 4).  Returns (id_a, id_b, hamming), id_a < id_b.
    """
    sigs = _portable_simhash_sigs(df, text_col, id_col)

    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright("sig", 8 * b).bitwiseAND(F.lit(255))
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.expr("bit_count(a.sig ^ b.sig)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


def portable_simhash_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Star-shaped SimHash near-dup EDGES — the candidate-volume-
    bounded twin of :func:`portable_simhash_pairs`, exactly as
    :func:`portable_minhash_star_edges` bounds the MinHash pair
    emitter (VERDICT r12 #4: d03's pair contract is QUADRATIC in the
    duplication factor by definition — SCALING measured 6.72× time for
    10× rows on the replica corpus because every replica 10-clique
    emits C(10,2)=45 pairs).

    Two linear legs replace the clique emission:

    1. **Exact collapse on the signature.**  Identical texts (and any
       distinct texts that happen to share all 32 signature bits) are
       grouped on ``sig``; each group contributes (min-id rep → member)
       edges directly — hamming 0 by construction, no verify, no
       banding.  On a replica-F corpus this leg is F-1 edges per
       document group: LINEAR in duplication.
    2. **Star edges over signature representatives.**  Only the one
       rep per distinct signature enters the 4 × 8-bit pigeonhole
       chunking; each (band, key) bucket of k reps emits the k-1 edges
       to its min-id member instead of C(k,2) pairs, each verified
       ``bit_count(xor) ≤ max_hamming`` map-side before the dedup
       exchange.  Candidate volume is O(distinct-sigs × 4) at ANY
       duplication skew.

    Connected components of the output coincide with components of the
    pair emitter's output on duplicate clusters (the workload this
    exists for): sig-identical docs are connected through leg 1, and
    the rep-level star graph is the doc-level graph's quotient by
    signature equality — the same argument as the MinHash star emitter
    (dedup.py:528), made strictly simpler because candidate keys and
    hamming are functions of ``sig`` alone.  NOT a drop-in for
    pair-set consumers: the output is a spanning edge set, not the
    near-dup pair relation.

    The two legs cannot overlap: leg 1 edges have hamming 0 (same
    sig); leg 2 joins reps with pairwise-distinct sigs, so hamming
    ≥ 1.  Returns (id_a, id_b, hamming), id_a < id_b (id_a is a
    sig-group or bucket representative).
    """
    from pyspark.sql.window import Window as _W

    sigs = _portable_simhash_sigs(df, text_col, id_col)
    # One window-min over the sig partition instead of groupBy +
    # join-back: same rep assignment, half the shuffles (the d05 /
    # d22 stop-fingerprint precedent).  localCheckpoint (the graph.py
    # precedent): the mapping feeds the exact leg AND both sides of
    # the bucket join — truncating the lineage both materializes the
    # signature computation once and stops Catalyst re-analyzing the
    # wide sig expression per consumer branch (measured ~1 s of flat
    # per-query planning cost under plain .cache()).
    mapping = sigs.withColumn(
        "rep", F.min("id").over(_W.partitionBy("sig"))
    ).localCheckpoint(eager=True)
    exact_edges = mapping.filter(F.col("id") != F.col("rep")).select(
        F.col("rep").alias("id_a"),
        F.col("id").alias("id_b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    rep_sigs = mapping.filter(F.col("id") == F.col("rep")).select("id", "sig")

    chunks = rep_sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright("sig", 8 * b).bitwiseAND(F.lit(255))
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # min(struct(id, sig)) orders by id (unique), carrying the rep's
    # sig along so the hamming verify needs no join-back to sigs.
    breps = chunks.groupBy("band", "key").agg(
        F.min(F.struct("id", "sig")).alias("r")
    )
    ham = F.expr("bit_count(r.sig ^ sig)")
    near_edges = (
        chunks.join(breps, ["band", "key"])
        .filter(F.col("id") > F.col("r.id"))
        # Verify BEFORE the duplicate-candidate dedup (the d03
        # precedent): hamming is a cheap map-side bit op, so failing
        # edges never shuffle into the distinct.
        .filter(ham <= max_hamming)
        .select(
            F.col("r.id").alias("id_a"),
            F.col("id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )
    return exact_edges.unionByName(near_edges)


def ppjoin_prefix_table(
    sh: DataFrame, threshold: float, rarest_first: bool = False
) -> DataFrame:
    """(id, s) PREFIX table for PPJoin prefix filtering (Xiao et al.,
    WWW'08) from an (id, sh) table of sorted distinct shingle arrays.

    The prefix lemma holds for ANY corpus-wide total order; prefix
    length is ``|d| − ⌈t·|d|⌉ + 1``.  ``rarest_first=False`` slices
    the scan-local lexicographic order (zero shuffles — d20's default,
    3-5x faster end-to-end at sf0.1).  ``rarest_first=True`` re-orders
    every document's shingles by (global document frequency, shingle)
    before slicing — one extra aggregation + join, same lemma, same
    verified pair set — which keeps prefix buckets BOUNDED on a
    boilerplate-heavy corpus where the lexicographically smallest
    shingles are exactly the hot ones (the documented 100 TB skew
    escape hatch; pinned by tests/test_dedup.py::TestPPJoinSkew)."""
    plen = F.size("sh") - F.ceil(F.lit(threshold) * F.size("sh")) + 1
    if not rarest_first:
        return sh.select(
            "id", F.explode(F.slice("sh", 1, plen)).alias("s")
        )
    tokens = sh.select("id", plen.alias("plen"), F.explode("sh").alias("s"))
    df_counts = tokens.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # (df, s) struct sort = the rarest-first total order, identical on
    # every document; slice the prefix off the re-ordered array.
    ranked = (
        tokens.join(df_counts, "s")
        .groupBy("id", "plen")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "s"))
            ).alias("ranked")
        )
    )
    return ranked.select(
        "id",
        F.explode(
            F.slice("ranked", F.lit(1), F.col("plen"))
        ).alias("r"),
    ).select("id", F.col("r.s").alias("s"))


def ppjoin_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    shingle_n: int = 3,
    rarest_first: bool = False,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via PPJoin prefix filtering
    — the operator form of the d20 query (queries.py:
    d20_prefix_filter_jaccard), with the rarest-first comparator its
    docstring documents as the skew fallback.  Returns (id_a, id_b,
    jaccard) with id_a < id_b; the pair set is comparator-invariant
    (the lemma guarantees completeness under any shared total order,
    and the exact verify discards false candidates)."""
    tok = tokens_col(F.col(text_col))
    sh = df.filter(F.size(tok) >= shingle_n).select(
        F.col(id_col).alias("id"),
        F.array_sort(
            F.array_distinct(shingles_col(tok, shingle_n))
        ).alias("sh"),
    )
    prefix = ppjoin_prefix_table(sh, threshold, rarest_first)
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pairs = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
        "id_a",
    ).join(
        sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        pairs.filter(inter / union >= threshold)
        .select(
            "id_a", "id_b", F.round(inter / union, 4).alias("jaccard")
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide
    a window of ``window`` consecutive gram hashes, select the MINIMUM
    hash per window.  Guarantees any shared token run of length
    ≥ window + k - 1 contributes at least one COMMON fingerprint
    between the two documents, while selecting only ~2/(window+1) of
    all gram hashes — the bounded-density substring index a fixed
    stride (``d11``) cannot promise.

    Hash family is the engine-portable md5-prefix pattern
    (:func:`portable_minhash_pairs`): 12 lowercase hex chars order
    lexicographically the same in Spark and DuckDB, so the selected
    SET is oracle-reproducible across engines.

    Returns one row per selected (document, window): (id, pos, fp) —
    ``pos`` is the 1-based window start over the gram sequence.
    Aggregate or ``distinct()`` per caller need.

    Scale: the gram hash is computed scan-side; only
    (id, pos, 12-char fp) enters the single id-partitioned shuffle
    feeding the sliding-window min.  Documents shorter than
    k + window - 1 tokens yield no rows (no full window exists).
    """
    from pyspark.sql.window import Window as W

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") >= k + window - 1
    )
    grams = base.select(
        "id",
        (F.size("toks") - (k - 1)).alias("n_grams"),
        F.explode(F.sequence(F.lit(1), F.size("toks") - (k - 1))).alias(
            "pos"
        ),
        "toks",
    ).select(
        "id",
        "n_grams",
        "pos",
        F.substring(
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), k))), 1, 12
        ).alias("h"),
    )
    return (
        grams.withColumn(
            "fp",
            F.min("h").over(
                W.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
            ),
        )
        .filter(F.col("pos") <= F.col("n_grams") - (window - 1))
        .select("id", "pos", "fp", "n_grams")
    )
