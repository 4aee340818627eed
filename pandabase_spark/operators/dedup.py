"""Deduplication operators: exact → fuzzy, each with a 100 TB story.

Ladder of cost vs recall:

1. :func:`dedup_exact` / :func:`dedup_by_content_hash` — one shuffle on
   the (hashed) content; the cheapest pass, run it first.
2. :func:`ngram_jaccard_pairs` — exact set-similarity via a shingle
   inverted index (explode → self-join on shingle → count). Exact but
   the join fans out on common shingles; the ``max_shingle_df`` cutoff
   bounds the blowup (standard trick: a shingle shared by thousands of
   documents carries no discriminative signal and only multiplies
   pairs).
3. :func:`minhash_lsh_pairs` — the scale path. Constant-size signature
   per document (k min-hashes), banded into buckets; candidate pairs
   only within buckets (no all-pairs anywhere), then exact-Jaccard
   verification of candidates only. This is the textbook
   MinHash+LSH pipeline (Broder '97 / MMDS ch.3) as three shuffles:
   explode-shingles, band-groupBy, verify-join.
4. :func:`simhash_pairs` — Hamming-ball variant; signature is a single
   64-bit int, buckets via bit-chunks (Charikar '02).
5. :func:`embedding_near_dup_pairs` — semantic near-dup via cosine on
   embeddings, bucketed by random-hyperplane LSH (shares machinery with
   :mod:`pandabase_spark.operators.similarity`).

The reference has no dedup surface at all (its closest concept is the
primary-key uniqueness check, reference:pandabase/sql.py:96-97); this
module is extension surface mapped to the driver's ``documents`` table.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from pandabase_spark.functions.text import (
    char_ngrams,
    content_hash,
    content_hash_fast,
    normalize_text,
    simhash64,
    tokenize,
    word_ngrams,
    _token_hash60,
)

# Deterministic multipliers / offsets for the minhash permutation family
# h_i(x) = (a_i * x + b_i) mod M31. Derived from md5 so they are stable
# across processes with no RNG state. 31-bit modulus keeps every
# intermediate product below 2^62 — no int64 overflow (Spark 4 runs in
# ANSI mode, where overflow raises instead of wrapping).
_M31 = (1 << 31) - 1  # Mersenne prime


def _perm_constants(i: int) -> tuple[int, int]:
    d = hashlib.md5(f"pandabase-minhash-{i}".encode()).hexdigest()
    a = (int(d[:8], 16) % (_M31 - 1)) + 1  # in [1, M31-1]
    b = int(d[8:16], 16) % _M31
    return a, b


def dedup_exact(
    df: DataFrame, subset: Sequence[str], keep: str | None = None
) -> DataFrame:
    """Exact dedup on ``subset`` columns; keeps the row with the minimum
    ``keep`` column per group (deterministic), or an arbitrary row when
    ``keep`` is None (``dropDuplicates`` — cheaper, no tie-break shuffle
    difference at scale; both are a single hash-aggregate shuffle).
    """
    if keep is None:
        return df.dropDuplicates(list(subset))
    # min_by keeps the full row with the smallest `keep`; single
    # partial-aggregated groupBy — no window, no sort.
    agg = df.groupBy(*subset).agg(
        F.min_by(F.struct(*df.columns), F.col(keep)).alias("_row")
    )
    return agg.select([F.col(f"_row.{c}").alias(c) for c in df.columns])


def dedup_by_content_hash(
    df: DataFrame, text_col: str, id_col: str, *, hash: str = "md5"
) -> DataFrame:
    """Exact text dedup keyed on a hash of the normalized text:
    survivors are the min-id row per hash plus a ``n_copies`` count.
    Hashing first means the shuffle key is 8-16 bytes instead of the
    full document — at 100 TB that is the difference between shuffling
    hashes and shuffling the corpus. ``hash="md5"`` is the
    oracle-replayable form; ``hash="xxhash64"`` the codegen'd
    production form (same groups, parity-tested)."""
    if hash not in ("md5", "xxhash64"):
        raise ValueError(f"hash must be 'md5' or 'xxhash64', got {hash!r}")
    fn = content_hash if hash == "md5" else content_hash_fast
    h = df.select(
        F.col(id_col), fn(text_col).alias("_chash")
    )
    groups = h.groupBy("_chash").agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )
    return (
        df.join(groups.select(id_col, "n_copies"), on=id_col, how="inner")
    )


def duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact duplicates: (content_hash, n_copies, member_ids).

    ``collect_list`` per hash — list size is bounded by the duplicate
    multiplicity, not the corpus."""
    return (
        df.select(content_hash(text_col).alias("chash"), F.col(id_col))
        .groupBy("chash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def _shingles(text_col: str, mode: str, n: int) -> Column:
    """Shingle array WITHOUT per-row dedup: ``array_distinct`` is
    O(len²) per row and unnecessary — min() folds ignore duplicates and
    the Jaccard path dedups row-wise after explode (a hash shuffle,
    linear) instead."""
    if mode == "word":
        return word_ngrams(text_col, n)
    if mode == "char":
        return char_ngrams(text_col, n)
    raise ValueError(f"shingle mode must be 'word' or 'char', got {mode!r}")


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, mode: str, n: int
) -> DataFrame:
    """(id, shingle) rows — the input both minhash and Jaccard share.

    Word mode explodes the n-gram POSITION RANGE and assembles each
    shingle with slice + array_join over the token array — every
    expression is a plain (non-higher-order) scalar, so the whole
    stage codegens, and assembly happens WITHIN the source row, so no
    exchange exists before the consumer's own aggregation. The two
    earlier forms both paid more: transform+lambda is interpreted
    (measured ~5× slower at 5k docs), and the posexplode+window-lead
    replacement shuffled the FULL token stream on doc id and ran a
    non-codegen WindowExec just to line up lead() neighbors (r14:
    Exchange+Sort+Window → nothing; consumers' per-doc aggregates now
    see doc-local rows, so their map-side partial aggregation reduces
    the shuffle to one row per doc per aggregate). Output matches the
    window form exactly, including the "short doc yields one partial
    shingle" edge, the "empty text yields one empty shingle" edge
    (split('') = ['']), and the "NULL text yields NO rows" edge: the
    token array is NULL for NULL text, and sequence/greatest would
    still emit position 1, producing one (id, NULL) shingle per
    NULL-text doc where the window form emitted none — and since
    xxhash64(NULL) is a constant, every NULL-text doc would minhash
    to the same signature and read as a near-duplicate of all the
    others. NULL token arrays are filtered before the explode (r15
    advisory fix).
    """
    if mode == "char":
        return df.select(
            F.col(id_col), F.explode(_shingles(text_col, mode, n)).alias("sh")
        )
    toks = df.select(F.col(id_col), tokenize(text_col).alias("_tk")).where(
        F.col("_tk").isNotNull()
    )
    pos = toks.select(
        F.col(id_col),
        F.col("_tk"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("_tk") - (n - 1), F.lit(1))
            )
        ).alias("_pos"),
    )
    return pos.select(
        F.col(id_col),
        F.array_join(F.slice("_tk", F.col("_pos"), n), " ").alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    mode: str = "word",
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Plan: distinct shingles per doc → explode (one row per (shingle,
    doc)) → self-join on shingle (this is the inverted-index join; the
    only pairs ever materialized are those sharing a shingle) → count
    common shingles per pair → |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.

    ``max_shingle_df`` drops shingles whose document frequency exceeds
    the cutoff before the self-join — the fan-out bound for skewed
    vocabulary. Returns (id_1, id_2, jaccard) with id_1 < id_2.
    """
    # the distinct (id, shingle) frame feeds THREE consumers (sizes,
    # both self-join sides — five with the df-cutoff's count pass);
    # materialize it once (lazy localCheckpoint: first action runs the
    # shingle pipeline, later consumers read the blocks, and the
    # ContextCleaner reclaims them when the frame goes out of scope —
    # the same pattern as the ranking bucketing) instead of re-running
    # the corpus scan + shingle assembly per consumer (r14: the
    # executed plan showed 3 full document scans for this one operator)
    sh = _shingle_rows(df, id_col, text_col, mode, n).distinct()
    sh = sh.localCheckpoint(eager=False)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("sh").count().where(F.col("count") <= max_shingle_df)
        )
        sh = sh.join(keep.select("sh"), on="sh", how="left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col(id_col).alias("id_1"), "sh")
    b = sh.select(F.col(id_col).alias("id_2"), "sh")
    common = (
        a.join(b, on="sh")
        .where(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    sa = sizes.select(F.col(id_col).alias("id_1"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_2"), F.col("_n").alias("_nb"))
    jac = F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c"))
    return (
        common.join(sa, "id_1")
        .join(sb, "id_2")
        .select("id_1", "id_2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    shingle_n: int = 3,
    shingle_mode: str = "word",
) -> DataFrame:
    """MinHash signature (array<long>, length num_perm) per document.

    Formulated as explode → hash once → one groupBy with num_perm ``min``
    aggregates (columnar hash-agg with map-side combine) rather than
    num_perm nested array folds — the aggregate form hashes each shingle
    exactly once and lets Tungsten vectorize the mins, which measured
    ~20× faster than the nested-HOF formulation. Shingle hashes are
    reduced to [0, M31): products with 31-bit multipliers stay under
    2^62, safe under ANSI overflow checking.
    """
    sh = _shingle_rows(df, id_col, text_col, shingle_mode, shingle_n)
    # xxhash64 (native, codegen'd) rather than the md5+conv hash the
    # oracle-checked operators use — minhash needs no cross-engine
    # reproducibility, only determinism, and xxhash64 is ~10× cheaper
    h = sh.select(
        id_col, F.pmod(F.xxhash64(F.col("sh")), F.lit(_M31)).alias("h")
    )
    aggs = []
    for i in range(num_perm):
        a, b = _perm_constants(i)
        aggs.append(
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_M31)).alias(f"_s{i}")
        )
    sig = h.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[f"_s{i}" for i in range(num_perm)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    shingle_mode: str = "word",
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    With num_perm=64, bands=16 (rows/band r=4) the match-probability
    S-curve is 1-(1-j^4)^16 — ~0.5 at j≈0.55. Candidate generation:
    explode signatures into (band_id, band_hash) keys, groupBy, pair up
    within buckets. All-pairs work is confined to same-bucket groups —
    the property that makes this the 100 TB path. ``verify=True``
    re-checks candidates with exact Jaccard (inverted-index join
    restricted to candidate ids only) and filters by ``threshold``.

    Returns (id_1, id_2[, jaccard]) with id_1 < id_2.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sig = minhash_signatures(
        df, id_col, text_col,
        num_perm=num_perm, shingle_n=shingle_n, shingle_mode=shingle_mode,
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.slice("signature", i * r + 1, r)).alias("bhash"),
            )
            for i in range(bands)
        ]
    )
    buckets = sig.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band", "bb.bhash"
    )
    # both sides of the candidate self-join read `buckets`; without a
    # persist the full shingle→signature pipeline runs twice
    buckets = buckets.persist()
    l = buckets.select(F.col(id_col).alias("id_1"), "band", "bhash")
    rr = buckets.select(F.col(id_col).alias("id_2"), "band", "bhash")
    cand = (
        l.join(rr, on=["band", "bhash"])
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    # materialize the (small) candidate set, then release the bucket
    # cache — persisted blocks must not accumulate across calls.
    # localCheckpoint (not persist): blocks are tied to the DataFrame's
    # lifetime and reclaimed by the ContextCleaner when it goes out of
    # scope, so nothing stays pinned after the caller drops the result
    cand = cand.localCheckpoint(eager=True)
    buckets.unpersist()
    if not verify:
        return cand
    cand_ids = cand.select(F.explode(F.array("id_1", "id_2")).alias(id_col)).distinct()
    narrowed = df.join(cand_ids, on=id_col, how="left_semi")
    exact = ngram_jaccard_pairs(
        narrowed, id_col, text_col,
        n=shingle_n, mode=shingle_mode, threshold=threshold,
    )
    return cand.join(exact, on=["id_1", "id_2"], how="inner")


def _simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 60
) -> DataFrame:
    """(id, fp) SimHash fingerprints via explode + columnar aggregation.

    Same reformulation as minhash_signatures: token rows are hashed once
    (xxhash64, codegen'd), then one groupBy computes the per-bit ±1 sums
    as ``bits`` SUM aggregates and a final projection assembles the
    fingerprint — measured ~10× faster than the nested
    transform/aggregate column expression in
    :func:`pandabase_spark.functions.text.simhash64` (which remains the
    single-expression form for ad-hoc column use).
    """
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("tok"))
    h = toks.select(id_col, F.xxhash64("tok").alias("h"))
    aggs = [
        F.sum(
            F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("int") * 2 - 1
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    sums = h.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(
            F.col(f"_b{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), fp.alias("fp"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    bits: int = 60,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole bucketing (Manku et al. '07): split the fingerprint into
    ``chunks`` bit-ranges; any pair within Hamming distance < chunks
    shares at least one exact chunk, so candidates are same-chunk-value
    groups — again no all-pairs. Verification is ``bit_count(a XOR b)``.
    Requires max_hamming < chunks for completeness.
    """
    if max_hamming >= chunks:
        raise ValueError("completeness requires max_hamming < chunks")
    width = bits // chunks
    # both sides of the candidate self-join read the fingerprints;
    # materialize once (tiny: one (id, int64) row per doc) or the
    # 60-aggregate pipeline runs twice
    fp = _simhash_fingerprints(df, id_col, text_col, bits=bits).localCheckpoint(
        eager=True
    )
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright("fp", i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("cval"),
            )
            for i in range(chunks)
        ]
    )
    keyed = fp.select(id_col, "fp", F.explode(chunk_structs).alias("cc")).select(
        id_col, "fp", "cc.chunk", "cc.cval"
    )
    l = keyed.select(F.col(id_col).alias("id_1"), F.col("fp").alias("fp_1"), "chunk", "cval")
    r = keyed.select(F.col(id_col).alias("id_2"), F.col("fp").alias("fp_2"), "chunk", "cval")
    return (
        l.join(r, on=["chunk", "cval"])
        .where(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.bit_count(F.col("fp_1").bitwiseXOR(F.col("fp_2"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    *,
    id_1: str = "id_1",
    id_2: str = "id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster assembly: connected components over a pair
    list, as iterative min-label propagation.

    Each iteration is one distributed join+aggregate (label ←
    min(label, neighbors' labels)); convergence after O(component
    diameter) rounds — near-dup clusters are shallow (pairs chain only
    through shared shingles), so this terminates in a handful of
    rounds. The driver loop only checks a 1-row convergence count per
    round; all data movement is executor-side. Returns
    (id, component_id) with component_id = min member id.

    This is the standard "large-star/small-star lite" shape; for
    graphs with deep diameters use the full Kiveris et al. algorithm.
    """
    edges = (
        pairs.select(F.col(id_1).alias("src"), F.col(id_2).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_2).alias("src"), F.col(id_1).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        propagated = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jumping: comp' = label[comp]. Every comp value is a
        # node id (initial labels are ids; min() only picks existing
        # labels) and label[x] <= x, so the jump only tightens — labels
        # effectively propagate two hops per round, halving the number
        # of rounds for deep chains (Kiveris-style shortcut).
        lut = propagated.select(
            F.col("id").alias("_cid"), F.col("comp").alias("_ccomp")
        )
        # localCheckpoint truncates lineage each round — without it the
        # logical plan doubles per iteration and Catalyst re-analysis
        # dominates (the standard iterative-algorithm failure mode)
        new_labels = (
            propagated.join(lut, propagated.comp == lut._cid, "left")
            .select(
                "id",
                F.coalesce(F.col("_ccomp"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id"), F.col("comp").alias("component_id"))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    planes: int = 12,
) -> DataFrame:
    """Semantic near-duplicates: pairs with cosine ≥ threshold, found
    inside random-hyperplane LSH buckets (see similarity.py). Exact
    cosine verification runs only within buckets. Probability a pair at
    angle θ lands in the same bucket is (1-θ/π)^planes — tune ``planes``
    down for recall, up for speed."""
    from pandabase_spark.functions.vector import cosine_similarity
    from pandabase_spark.operators.similarity import hyperplane_buckets

    b = hyperplane_buckets(df, vec_col, planes=planes)
    l = b.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("_v1"), "bucket")
    r = b.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("_v2"), "bucket")
    return (
        l.join(r, on="bucket")
        .where(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            cosine_similarity(F.col("_v1"), F.col("_v2")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Winnowed (rolling-hash) fingerprints — Schleimer/Wilkerson/Aiken '03
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    window: int = 4,
    hash: str = "xxhash64",
) -> DataFrame:
    """(id, fps) winnowed document fingerprints (array, distinct).

    The winnowing scheme of Schleimer/Wilkerson/Aiken (SIGMOD '03, the
    MOSS algorithm): hash every character ``n``-gram, slide a window of
    ``window`` consecutive hashes, keep each window's minimum, dedup.
    Guarantee: any shared substring of length ≥ ``window + n - 1``
    yields at least one shared fingerprint between two documents.

    In a scalar engine the n-gram hashes come from an O(1)-update
    rolling (Rabin-Karp) hash; here each hash is an independent
    codegen'd expression over the staged text — same output, better
    vectorization, no carried state. The hash array is STAGED as a
    column before the window-min pass: sliding over a nested
    (non-attribute) array expression re-evaluates every md5 per window,
    turning O(len·w) into O(len²) per document.

    ``hash`` picks the n-gram hash function — the fast/oracle split:

    - ``"xxhash64"`` (default): native 64-bit hashes compared
      numerically — whole-stage-codegen'd, no digest allocation,
      measured ~2-3× faster end-to-end. Winnowing only needs *a*
      deterministic min-selection, not a specific hash, so the
      near-dup pairs the fast form finds coincide with md5's wherever
      documents share ≥ min_common fingerprints under both
      min-selections (pinned by the md5-vs-xxhash parity test). This
      is the production default.
    - ``"md5"``: hex strings compared lexicographically —
      reproducible in DuckDB, so the fingerprint set is
      oracle-checkable. Reserved for queries an external engine must
      replay; the constant factor is the md5 itself.
    """
    if hash not in ("md5", "xxhash64"):
        raise ValueError(f"hash must be 'md5' or 'xxhash64', got {hash!r}")
    normed = df.select(
        F.col(id_col), normalize_text(text_col).alias("_t")
    )
    # n-gram hashes over the staged _t attribute: char_ngrams() would
    # re-run the normalization regex once per element position
    idx = F.sequence(
        F.lit(1), F.greatest(F.length("_t") - (n - 1), F.lit(1))
    )
    if hash == "md5":
        def _h(i):
            return F.md5(F.col("_t").substr(i, F.lit(n)).cast("binary"))
    else:
        def _h(i):
            return F.xxhash64(F.col("_t").substr(i, F.lit(n)))
    staged = normed.select(
        F.col(id_col),
        F.transform(idx, _h).alias("_hs"),
    )
    # window-min as least(get(i)..get(i+w-1)) rather than
    # array_min(slice(...)): slice allocates a w-element array of
    # 32-char hex strings per window position (millions of short-lived
    # arrays per batch, measured 3× slower at 5k docs). F.get is
    # 0-based and null-safe past the array end (short documents), and
    # least() skips nulls — identical min semantics to array_min over
    # a truncated slice, even under ANSI mode where element_at throws.
    if window == 1:
        wins = F.col("_hs")
    else:
        wins = F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("_hs") - (window - 1), F.lit(1))
            ),
            lambda i: F.least(
                *[F.get(F.col("_hs"), i + (j - 1)) for j in range(window)]
            ),
        )
    return staged.select(
        F.col(id_col), F.array_distinct(wins).alias("fps")
    )


def winnow_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    window: int = 4,
    min_common: int = 3,
    max_fp_df: int | None = None,
    hash: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_common`` winnowed fingerprints —
    the MOSS similarity-report shape. Plan: fingerprints → explode →
    inverted-index self-join on fingerprint → count per pair. Only
    pairs sharing a fingerprint are ever materialized; the winnowing
    density (~2/(window+1)) keeps the index a fraction of the corpus.

    ``max_fp_df`` drops fingerprints whose document frequency exceeds
    the cutoff before the self-join — the same fan-out bound as
    ``ngram_jaccard_pairs``: window-min selection favors globally small
    hashes, so natural-language corpora concentrate a few boilerplate
    fingerprints in most documents (observed: without a cutoff a
    500-doc corpus yields 98k of the 125k possible pairs; at df≤5 the
    21 true near-dup pairs remain). At 100 TB the cutoff is what keeps
    the join linear instead of quadratic.
    Returns (id_1, id_2, n_common) with id_1 < id_2.
    """
    # explode_outer, NOT explode: for a plain explode the optimizer
    # infers a `size(fps) > 0` filter and pushes it below the staging
    # projections, re-inlining the full fingerprint expression into the
    # predicate — the window-min slice then re-evaluates the whole
    # md5-hash array per window element, O(len²) regex+md5 per document
    # (observed: a 500-doc corpus ran minutes instead of seconds).
    # explode_outer is exempt from that rule, and the null-filter on the
    # generate OUTPUT cannot be pushed below the Generate. fps is never
    # empty (any text yields ≥1 window), so the semantics are identical.
    f = (
        winnow_fingerprints(df, id_col, text_col, n=n, window=window,
                            hash=hash)
        .select(F.col(id_col), F.explode_outer("fps").alias("fp"))
        .where(F.col("fp").isNotNull())
    )
    # the df-cutoff aggregate and both self-join sides read f — persist
    # or the md5 fingerprint pipeline runs three times (measured 13.6s
    # → 10.2s at 5k docs; the rest is the join/agg shuffles)
    f = f.persist()
    try:
        if max_fp_df is not None:
            keep = f.groupBy("fp").count().where(F.col("count") <= max_fp_df)
            f = f.join(keep.select("fp"), on="fp", how="left_semi")
        a = f.select(F.col(id_col).alias("id_1"), "fp")
        b = f.select(F.col(id_col).alias("id_2"), "fp")
        out = (
            a.join(b, on="fp")
            .where(F.col("id_1") < F.col("id_2"))
            .groupBy("id_1", "id_2")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
            .where(F.col("n_common") >= min_common)
        )
        # materialize while the cache is alive, then release — persisted
        # blocks must not accumulate across operator calls
        out = out.localCheckpoint(eager=True)
    finally:
        f.unpersist()
    return out


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_len: int = 12,
    prefix_len: int = 60,
    max_distance: int = 8,
    suffix_block: bool = False,
    max_block_df: int | None = None,
) -> DataFrame:
    """Record-linkage fuzzy matching: blocking + edit-distance verify.

    The classic two-phase linkage plan (Fellegi-Sunter style blocking):
    candidate pairs are generated ONLY within blocks — documents whose
    normalized text shares its first ``block_len`` characters — then
    verified with Levenshtein distance over ``prefix_len``-char
    prefixes. Blocking turns the O(n²) all-pairs comparison into an
    equi-join on the block key (one hash shuffle); the quadratic step
    runs per block, bounded by the largest block.

    ``max_block_df`` bounds that largest block: blocks holding more
    than the cutoff documents are dropped BEFORE the self-join (the
    same df-cutoff ``ngram_jaccard_pairs`` applies to shingles). A
    boilerplate-heavy corpus — thousands of documents opening with the
    same 12-char license header — otherwise degenerates to
    near-quadratic inside one block; such mega-blocks carry no linkage
    signal anyway (a block key shared by thousands of records does not
    discriminate). With the cap, worst-case pair fan-out is
    ``max_block_df²/2`` per block regardless of corpus skew — the
    property that keeps the operator safe at 100 TB.

    ``suffix_block=True`` runs the standard multi-pass blocking: a
    second pass blocks on the LAST ``block_len`` characters, recovering
    pairs a first-position typo pushes into different prefix blocks.
    Passes union before the distance filter and pairs dedup on
    (id_1, id_2) — each extra pass adds one shuffle, recall only.

    Levenshtein is capped to prefixes because its cost is
    O(len_a·len_b) per pair — never run it on unbounded documents.
    Returns (id_1, id_2, edit_distance) with id_1 < id_2.

    The reference has no similarity surface (SURVEY.md §2 Table B);
    complements the token-set (Jaccard/MinHash) family with a
    character-level matcher that tolerates in-word typos.
    """
    from pandabase_spark.functions.text import normalize_text

    base = df.select(
        F.col(id_col), normalize_text(text_col).alias("_t")
    )
    block_keys = [F.substring("_t", 1, block_len)]
    if suffix_block:
        # greatest(len-k+1, 1) start, not a negative index: negative
        # substring positions past the string start are engine-specific;
        # this form is identical in Spark and ANSI SQL for short strings
        block_keys.append(
            F.expr(
                f"substring(_t, greatest(length(_t) - {block_len - 1}, 1), "
                f"{block_len})"
            )
        )

    def _pass(blk: Column) -> DataFrame:
        normed = base.select(
            F.col(id_col),
            F.substring("_t", 1, prefix_len).alias("_p"),
            blk.alias("_blk"),
        )
        if max_block_df is not None:
            keep = (
                normed.groupBy("_blk")
                .count()
                .where(F.col("count") <= max_block_df)
            )
            normed = normed.join(keep.select("_blk"), on="_blk", how="left_semi")
        a = normed.select(
            F.col(id_col).alias("id_1"), F.col("_p").alias("_p1"), "_blk"
        )
        b = normed.select(
            F.col(id_col).alias("id_2"), F.col("_p").alias("_p2"), "_blk"
        )
        return (
            a.join(b, on="_blk")
            .where(F.col("id_1") < F.col("id_2"))
            .select("id_1", "id_2", "_p1", "_p2")
        )

    cand = _pass(block_keys[0])
    for blk in block_keys[1:]:
        cand = cand.unionByName(_pass(blk))
    return (
        cand.dropDuplicates(["id_1", "id_2"])
        .select(
            "id_1",
            "id_2",
            F.levenshtein("_p1", "_p2").cast("int").alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= max_distance)
    )


def build_dedup_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    mode: str = "word",
    max_shingle_df: int | None = None,
) -> dict[str, DataFrame]:
    """Fingerprint index of a corpus for INCREMENTAL dedup: content
    hashes (exact), distinct shingle postings (inverted index), and
    per-doc shingle counts. At 100 TB these three frames are persisted
    as keyed tables at ingest time and maintained incrementally —
    classifying a new batch then touches the index, never the corpus
    text again. ``max_shingle_df`` bounds posting-list fan-out exactly
    as in :func:`ngram_jaccard_pairs`."""
    from pandabase_spark.functions.text import content_hash

    hashes = (
        df.select(content_hash(text_col).alias("chash"), F.col(id_col))
        .groupBy("chash")
        .agg(F.min(id_col).alias("match_id"))
    )
    sh = _shingle_rows(df, id_col, text_col, mode, n).distinct()
    out: dict[str, DataFrame] = {"hashes": hashes}
    if max_shingle_df is not None:
        dfc = sh.groupBy("sh").count()
        sh = sh.join(
            dfc.where(F.col("count") <= max_shingle_df).select("sh"),
            on="sh",
            how="left_semi",
        )
        # the PRUNED shingle list (distinct high-df values — small by
        # construction: each appears in > max_shingle_df docs, so there
        # are at most total_postings/max_shingle_df of them) is part of
        # the index: classify_against_index must drop the same shingles
        # from the BATCH side before sizing, or its Jaccard denominator
        # mixes filtered index sizes with unfiltered batch sizes
        out["pruned"] = dfc.where(
            F.col("count") > max_shingle_df
        ).select("sh")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    out["shingles"] = sh.select(F.col(id_col).alias("_ix_id"), "sh")
    out["sizes"] = sizes.select(
        F.col(id_col).alias("_ix_id"), F.col("_n").alias("_ix_n")
    )
    return out


def classify_against_index(
    new_df: DataFrame,
    index: dict[str, DataFrame],
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    mode: str = "word",
    threshold: float = 0.3,
) -> DataFrame:
    """Classify a NEW batch against :func:`build_dedup_index` output —
    the incremental-ingest dedup decision, one row per new document:

    - ``exact_dup``: content hash already indexed (match_id = the
      corpus's keep-id);
    - ``near_dup``: best indexed Jaccard ≥ threshold (ties broken on
      the RAW double then min match_id — identical bits across
      engines, no rounded-rank flips);
    - ``novel``: neither.

    Exact wins over near; batch-internal duplicates are out of scope
    (run the batch dedup first). Cost: the batch's shingles join the
    inverted index — proportional to the batch and its candidate set,
    with the corpus untouched."""
    from pandabase_spark.functions.text import content_hash

    new_h = new_df.select(
        F.col(id_col), content_hash(text_col).alias("chash")
    )
    exact = new_h.join(index["hashes"], on="chash").select(
        F.col(id_col),
        F.lit("exact_dup").alias("status"),
        F.col("match_id"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    rest = new_df.join(
        exact.select(id_col), on=id_col, how="left_anti"
    )
    sh = _shingle_rows(rest, id_col, text_col, mode, n).distinct()
    if index.get("pruned") is not None:
        # mirror the index's df cutoff on the batch side so both set
        # sizes in the Jaccard denominator use the same universe
        sh = sh.join(index["pruned"], on="sh", how="left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nn"))
    common = (
        sh.join(index["shingles"], on="sh")
        .groupBy(id_col, "_ix_id")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    jac = F.col("_c") / (F.col("_nn") + F.col("_ix_n") - F.col("_c"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("_j").desc(), F.col("_ix_id")
    )
    near = (
        common.join(sizes, on=id_col)
        .join(index["sizes"], on="_ix_id")
        .withColumn("_j", jac)
        .where(F.col("_j") >= threshold)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.lit("near_dup").alias("status"),
            F.col("_ix_id").alias("match_id"),
            F.round("_j", 4).alias("jaccard"),
        )
    )
    novel = (
        rest.join(near.select(id_col), on=id_col, how="left_anti")
        .select(
            F.col(id_col),
            F.lit("novel").alias("status"),
            F.lit(None).cast(near.schema["match_id"].dataType).alias(
                "match_id"
            ),
            F.lit(None).cast("double").alias("jaccard"),
        )
    )
    return exact.unionByName(near).unionByName(novel)


def span_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 16,
) -> DataFrame:
    """Corpus-wide EXACT SPAN dedup with document reconstruction — the
    sub-document granularity pass (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", adapted from suffix-
    array substrings to fixed ``span_words``-word windows, which keep
    the operator a pure shuffle pipeline instead of a driver-side
    suffix array). Every document is cut into consecutive
    non-overlapping word spans; a span that already occurred earlier
    in the corpus (by ``(doc_id, span_idx)`` order) is DROPPED, and
    each document's text is rebuilt from its surviving spans —
    boilerplate shared across documents disappears while unique prose
    stays.

    Scale shape — deliberately WINDOW-FREE: ranking occurrences with
    ``row_number() OVER (PARTITION BY span)`` would funnel every copy
    of a viral span into one task. Instead the first occurrence is a
    ``groupBy(span).agg(F.min(struct(doc_id, span_idx)))`` — partial
    aggregation combines duplicate spans map-side, so a span repeated
    a billion times ships ONE row per map partition to the reducer;
    the keeper row already carries everything reconstruction needs, so
    there is no join back to the exploded span stream at all. Two
    shuffles total (span agg, doc_id regroup) plus a broadcast-sized
    left join from the totals frame; the span split itself is a
    narrow Catalyst ``slice``/``array_join`` over the word array — no
    Python anywhere.

    Returns one row per input document:
    ``(id_col, text_dedup, spans_kept, spans_dropped)`` — a fully
    duplicated document survives with ``text_dedup=''`` (callers
    filter ``spans_kept > 0`` to discard husks; keeping the row makes
    the drop auditable).
    """
    words = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(words) / F.lit(float(span_words))).cast("long")
    spans = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans.cast("int") - 1),
                lambda i: F.array_join(
                    F.slice(words, i * span_words + 1, span_words), " "
                ),
            )
        ).alias("span_idx", "span"),
    )
    keepers = (
        spans.groupBy("span")
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col("span_idx").cast("long").alias("x"),
                )
            ).alias("first")
        )
        .select(
            F.col("first.i").alias(id_col),
            F.col("first.x").alias("span_idx"),
            "span",
        )
    )
    rebuilt = keepers.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("span_idx", "span"))
                ),
                lambda s: s["span"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("spans_kept"),
    )
    totals = docs.select(F.col(id_col), n_spans.alias("_n_spans"))
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("spans_kept", F.lit(0)).cast("long").alias(
                "spans_kept"
            ),
            (F.col("_n_spans") - F.coalesce("spans_kept", F.lit(0))).alias(
                "spans_dropped"
            ),
        )
    )
