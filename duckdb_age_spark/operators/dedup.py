"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB (this is the module where scale matters most):

* **Exact dedup** — hash-aggregate on a digest of the content, never on the
  content itself: the shuffle moves 16-byte keys, not documents.  With AQE on,
  skewed hot digests (e.g. empty docs) get split automatically.
* **MinHash** — signatures are computed per-row with JVM higher-order
  functions (no Python, no explode of the shingle set into rows), so the
  pre-LSH stage is a narrow map.  LSH banding then shuffles only
  (band_id, band_signature, doc_id) tuples — bytes per doc, not the doc.
  Candidate verification joins happen per-bucket, i.e. the classic
  O(n²)→O(candidates) cut.
* **Cross-engine determinism** — every hash is md5 (identical in DuckDB for
  the oracle); "hash i of shingle s" = md5(i || '|' || s).  Min over hex
  strings is lexicographic in both engines.

The synthetic corpus has no true duplicates, so pair-producing operators are
exercised on a *planted* corpus: the table unioned with prefix-mutated copies
of a deterministic subset (same construction in the oracle SQL) — this proves
the operators actually find near-dups, not just that they return empty sets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .iterate import loop_join_cache, materialize_and_release, truncate_lineage

# Per-bucket membership bound for the three LSH self-joins below.  A
# degenerate band key (thousands of near-identical short/empty docs landing
# on one MinHash band signature, one SimHash quarter, one sign-pattern
# bucket) makes the within-bucket join quadratic — the one remaining
# scale hazard VERDICT r4 flagged.  Buckets larger than the cap are
# dropped from CANDIDATE GENERATION entirely: members of such a bucket are
# (a) usually byte-identical junk that exact dedup already collapses, and
# (b) still discoverable through their OTHER bands (MinHash has `bands`
# independent chances; SimHash four quarters).  The default is far above
# any bucket the test fixtures produce, so the uncapped DuckDB oracles
# still hash-match; deployments tune it down (a few thousand) at 100 TB.
DEFAULT_MAX_BUCKET = 100_000


def _drop_hot_buckets(banded: DataFrame, key: str, max_bucket: int) -> DataFrame:
    """Remove every row whose ``key`` bucket holds more than ``max_bucket``
    members.  The hot-key list is produced by a map-side-combined count and
    is tiny by construction (only pathological keys exceed the cap), so it
    broadcast-anti-joins against the banded rows — no extra wide shuffle,
    same pattern as the copurchase hot-part cap (graph.py)."""
    hot = (
        banded.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_bucket)
        .select(key)
    )
    return banded.join(F.broadcast(hot), key, "left_anti")

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Digest-level duplicate census: one row per distinct md5, with count.
    Only digests shuffle; at 100 TB the map side reduces each partition to
    (digest → count) before the exchange."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("md5_hex"))
        .groupBy("md5_hex")
        .agg(F.count("*").alias("n_copies"))
        .groupBy()
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum("n_copies").alias("n_total"),
            F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)).alias("n_redundant"),
        )
    )


def drop_exact_dups(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per content digest.  Window over digest avoids
    a full self-join; partitions by 16-byte keys."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------


def _word_ngrams(col, n: int):
    """Array of word n-grams — no Python, no explode.

    Formulation: zip n shifted slices of the word array and concat_ws
    element-wise, instead of transform(sequence(...), i -> array_join(
    slice(words, i+1, n))).  Identical output strings (27,828,100 distinct
    shingles both ways on the sf10 fixture) but 5.6× faster measured
    (18.1 s vs 100.8 s): higher-order lambdas evaluate interpreted, and
    the slice-per-position version allocates an n-element array + joins it
    for EVERY position, while the zip chain does n-1 cheap two-arg
    concat_ws calls per position over arrays sliced once per row.
    Short rows (< n words) yield one truncated shingle in both versions:
    zip_with null-pads the shorter side and concat_ws skips nulls, exactly
    matching array_join over a short slice."""
    words = F.split(F.trim(col), r"\s+")
    length = F.greatest(F.size(words) - n + 1, F.lit(1))
    acc = F.slice(words, 1, length)
    for k in range(1, n):
        acc = F.zip_with(
            acc, F.slice(words, k + 1, length), lambda a, b: F.concat_ws(" ", a, b)
        )
    return acc


def _spread_hash_input(docs: DataFrame) -> DataFrame:
    """Hash-repartition the doc frame to the cluster's core count when its
    scan has FEWER splits — input splits are sized for scan bytes
    (maxPartitionBytes), not for the ~|shingles|× explode+md5 CPU that
    follows, so a 40 MB documents file runs the signature pass (the
    sub-stage profile's dominant CPU: 16.7 of 30.6 s at sf1, on 2 of 32
    cores) nearly serially.  Partitioning by doc_id means the exchange
    REPLACES the downstream groupBy(doc_id)'s exchange (ClusteredDistribution
    is satisfied by any hash partitioning on the key), so no net shuffle is
    added — and the moved bytes are the skinny pre-explode doc rows.  At
    real scale the scan already has >= cores splits and this is a no-op.
    Same diagnosis as _span_anchors' spread (r15); keyed instead of
    round-robin to reuse the exchange and skip sortBeforeRepartition.
    Shared implementation: :func:`..iterate.spread_small_scan` (the text /
    pipeline operators apply the same spread to their tokenize passes)."""
    from .iterate import spread_small_scan

    return spread_small_scan(docs, "doc_id")


def minhash_signatures(docs: DataFrame, n_hashes: int = 8, ngram: int = 3) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}): per-doc MinHash signature over word n-grams.

    Hash family: md5 digests sliced into 32-bit hex words — hash i is
    substr(md5((i div 4) || '|' || shingle), (i mod 4)*8 + 1, 8), so eight
    signature elements cost TWO md5 calls per shingle, not eight (md5 is
    the hash both engines compute bit-identically; this slicing is too —
    measured 4× less hashing CPU at sf10, the profile's dominant term).
    32-bit minwise values are the standard regime: collision probability
    of two mins across ~10³ shingles is ~10⁻⁶, far below est_jaccard's
    1/8 resolution.  Signature element i is the minimum over the doc's
    shingles.  Narrow map stage — scales to any size.
    """
    # explode-then-aggregate: Catalyst inlines higher-order-function
    # expressions per consumer, so a transform-based formulation re-splits
    # and re-hashes the text once per hash function (~8× waste, measured).
    # Exploding computes each shingle hash exactly once (subexpression
    # elimination shares each md5 across its four slices); groupBy(doc_id)
    # does map-side partial MIN before the single shuffle.
    grams = _spread_hash_input(docs).select(
        "doc_id", F.explode(F.array_distinct(_word_ngrams(F.col("text"), ngram))).alias("gram")
    )
    digests = [
        F.md5(F.concat(F.lit(f"{d}|"), F.col("gram")).cast("binary"))
        for d in range((n_hashes + 3) // 4)
    ]
    hashed = grams.select(
        "doc_id",
        *[
            F.substring(digests[i // 4], (i % 4) * 8 + 1, 8).alias(f"h_{i}")
            for i in range(n_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h_{i}").alias(f"mh_{i}") for i in range(n_hashes)]
    )


def planted_near_dup_corpus(docs: DataFrame, every: int = 10, keep_words: int = 30) -> DataFrame:
    """documents ∪ prefix-mutations of every ``every``-th doc (planted
    near-dups with ids offset by 1_000_000).  Deterministic; the oracle SQL
    constructs the identical corpus."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    mutated = (
        docs.where(F.col("doc_id") % every == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(F.slice(words, 1, keep_words), " ").alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(mutated)


def minhash_lsh_pairs(
    corpus: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    ngram: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding + exact signature-overlap
    estimate.

    rows/band = n_hashes/bands.  Docs agreeing on ALL rows of any band become
    candidates (single shuffle keyed by (band, band_signature)); candidates
    are scored by fraction of matching signature elements.  Buckets larger
    than ``max_bucket`` are excluded from candidate generation (see
    DEFAULT_MAX_BUCKET — bounds the quadratic per-bucket term).

    ``materialize`` (default True): run the pipeline now and release the
    internal signature cache before returning
    (iterate.materialize_and_release — VERDICT r13 item 4: the pinned
    CacheManager entry otherwise leaks for the session lifetime).  Pass
    False only to inspect/compose the unexecuted plan; that path leaves the
    signature cache pinned — it is exposed as ``result._internal_cache``
    (ADVICE r14) so the caller can ``result._internal_cache.unpersist()``
    after their action instead of a session-wide ``clearCache()``.

    ``checkpoint_dir``: the default materialization is an executor-local
    checkpoint (NOT executor-loss-safe on a real cluster); pass a durable
    dir to make it a reliable checkpoint — see
    :func:`iterate.materialize_and_release` (ADVICE r14 medium).

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, est ≥ 0.5.
    """
    rows_per_band = n_hashes // bands
    # persist: the banded self-join would otherwise recompute the whole
    # shingle->hash->min pipeline for BOTH join sides (measured 2x cost)
    sig = minhash_signatures(corpus, n_hashes=n_hashes, ngram=ngram).persist()

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
            )
            for b in range(bands)
        ]
    )
    # The banded self-join and the (doc_a, doc_b) dedup move ONLY ids —
    # signatures re-join afterwards for scoring.  Carrying all 2×n_hashes
    # signature columns through the candidate shuffle was the dominant
    # byte cost at sf10 (wide rows × one row per shared band): ids-only
    # candidates shuffle ~10× fewer bytes, and the two scoring joins are
    # narrow equi-joins against the persisted signature table.
    banded = sig.select("doc_id", F.explode(band_structs).alias("bk"))
    banded = _drop_hot_buckets(banded, "bk", max_bucket)
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("bk"))
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("bk"))
    cand = (
        a.join(b, on=["bk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(n_hashes)]
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(n_hashes)]
    )
    matches = sum(F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(n_hashes))
    out = (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("est_jaccard", F.round(matches / F.lit(float(n_hashes)), 4))
        .where(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b", "est_jaccard")
    )
    if not materialize:
        out._internal_cache = sig  # caller-releasable handle (ADVICE r14)
        return out
    return materialize_and_release(out, sig, checkpoint_dir=checkpoint_dir)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for candidate verification / small corpora)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(corpus: DataFrame, pairs: DataFrame, ngram: int = 3) -> DataFrame:
    """Exact Jaccard over word n-gram sets for given candidate (doc_a, doc_b)
    pairs — the verification stage after LSH.  Set ops run as JVM
    array_intersect/array_union on deduped shingle arrays.

    Measured and kept as-is (r15 optimization round): the gram table is
    consumed by both join sides, so the shingle pass runs twice — but a
    candidate-id broadcast semi-join prune (+ optional checkpoint) measured
    3x SLOWER at sf0.1 (0.35 s -> 1.0-1.4 s interleaved; the extra
    broadcast-exchange job and stage barriers cost more than the pruned
    recompute saves on an 11k-doc corpus).  At 100 TB, where the corpus
    shingle pass dwarfs a candidate broadcast, prune with
    corpus.join(F.broadcast(candidate_ids), "doc_id", "left_semi") before
    the gram compute (guide §3.2) — the LSH pairs frame is already
    materialized, so the id collection is block reads.

    Re-measured r16 with the full restructure (gram pass computed once,
    hash-repartitioned to the core count, lineage-truncated, PAIRS side
    broadcast so the corpus is never shuffled or broadcast) and two lighter
    variants (no checkpoint; no repartition): ALL slower than this shape at
    BOTH sf0.1 and sf1 — e.g. the pure-verify dedup_ngram_jaccard read
    0.31 s here vs 0.56-0.64 s restructured at sf0.1, and 0.48 s vs 1.44 s
    at sf1 (OPTIMIZATION_r16.md has the full matrix).  The extra exchange /
    materialization barriers cost more than the duplicated gram pass saves
    at every scale the fixtures can test, so the naive shape stays."""
    grams = corpus.select(
        "doc_id", F.array_distinct(_word_ngrams(F.col("text"), ngram)).alias("grams")
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("grams_a", "grams_b"))
                / F.size(F.array_union("grams_a", "grams_b")),
                4,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS, ngram: int = 3) -> DataFrame:
    """Per-doc SimHash (32-bit) over word 3-gram shingles: bit j is set iff
    the sum over shingles of (±1 by shingle-hash bit j) is positive.

    Shingle hash = first 15 hex chars of md5 (60 bits) — cross-engine stable
    via conv(hex,16,10).  Shingles (not bare words) keep unrelated docs that
    merely share vocabulary from clustering in hamming space.

    Same explode-then-aggregate shape as MinHash (see minhash_signatures for
    why not higher-order functions): each shingle is hashed once, the 32 bit
    votes are partial-aggregated map-side, one shuffle on doc_id.
    """
    grams = _spread_hash_input(docs).select(
        "doc_id", F.explode(_word_ngrams(F.col("text"), ngram)).alias("gram")
    )
    h = F.conv(F.substring(F.md5(F.col("gram").cast("binary")), 1, 15), 16, 10).cast("bigint")
    hashed = grams.select("doc_id", h.alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v_{j}")
            for j in range(bits)
        ]
    )
    sim = sum(
        (F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(0) for j in range(bits)),
        F.lit(0),
    )
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    corpus: DataFrame,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ 3, bucketed by the four
    4-bit quarters (pigeonhole: ≤3 flipped bits across 4 quarters ⇒ at least
    one quarter matches exactly — LOSSLESS banding) so the join is
    band-local, not all-pairs.  Quarters holding more than ``max_bucket``
    docs are dropped from candidate generation (DEFAULT_MAX_BUCKET).
    ``materialize`` / ``checkpoint_dir``: cache-hygiene and
    fault-tolerance switches, see :func:`minhash_lsh_pairs`."""
    sh = simhash(corpus, bits=bits).persist()  # self-join below (see minhash_lsh_pairs)
    quarter = bits // 4
    mask = (1 << quarter) - 1
    buckets = F.array(
        *[
            F.struct(
                F.lit(p).alias("part"),
                F.shiftright(F.col("simhash"), p * quarter).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for p in range(4)
        ]
    )
    banded = sh.select("doc_id", "simhash", F.explode(buckets).alias("bk"))
    banded = _drop_hot_buckets(banded, "bk", max_bucket)
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "bk")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "bk")
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    out = (
        a.join(b, on=["bk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    if not materialize:
        out._internal_cache = sh  # caller-releasable handle (ADVICE r14)
        return out
    return materialize_and_release(out, sh, checkpoint_dir=checkpoint_dir)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def planted_near_dup_embeddings(embeddings: DataFrame, every: int = 10) -> DataFrame:
    """embeddings ∪ near-copies of every ``every``-th vector (first dim
    scaled by 1.25 — exact in IEEE double, so the oracle replays it
    bit-identically; cosine to the original stays ≈0.99)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    planted = embeddings.where(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(F.array(F.element_at(v, 1) * 1.25), F.slice(v, 2, 63)).alias("embedding"),
    )
    return embeddings.select("vec_id", v.alias("embedding")).unionByName(planted)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-identical vectors by cosine ≥ threshold.
    ``materialize`` / ``checkpoint_dir``: cache-hygiene and
    fault-tolerance switches, see :func:`minhash_lsh_pairs`.

    Scale path: bucket by sign-pattern of the first 16 dims (a 1-projection
    LSH) so the self-join is bucket-local; the full dot product only runs on
    bucket collisions.  At 100 TB the bucket key also becomes the shuffle
    key, bounding the join fan-out; sign-pattern buckets larger than
    ``max_bucket`` (e.g. a mass of zero/near-zero vectors all landing on
    pattern 0xFFFF) are dropped from candidate generation (DEFAULT_MAX_BUCKET).

    16 dims, not 8 (round 11): 2^8 = 256 buckets caps join parallelism at
    256 keys and the per-bucket quadratic term at |corpus|/256 per side —
    measured at the 100×-replica scale, one AQE-coalesced task ground for
    30+ minutes on three monster buckets.  2^16 = 65,536 buckets keeps the
    incidental (non-dup) collision rate ~n/65k per bucket while TRUE
    near-dups (sign-preserving by definition of high cosine on these
    corpora; the planted 1.25×-dim-1 variant exactly) still collide.  The
    oracle replays the identical 16-dim key (contract._EMB_BUCKET_SQL), so
    candidate semantics stay pinned.

    The explicit hash repartition on the bucket key (round 13) exists for
    AQE, not correctness: the bucket shuffle is byte-light (ids + key) but
    the join's OUTPUT work — a 64-dim interpreted-HOF dot product per
    candidate pair — is what needs the cores, and AQE's size heuristic
    coalesced the 12.9 M-pair sf10 join onto 2 tasks (174 s; the same
    byte-light/compute-heavy trap as the r8 text explodes).  A
    user-specified repartition with an explicit partition count is exempt
    from AQE coalescing, and both self-join sides inherit it, so the join
    runs at defaultParallelism with no extra exchange.  Per-partition
    values are untouched (the dot product is row-local), so oracle hashes
    are placement-independent.
    """
    dims = 16
    nparts = embeddings.sparkSession.sparkContext.defaultParallelism
    sign_key = sum(
        (
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i)).otherwise(0)
            for i in range(dims)
        ),
        F.lit(0),
    )
    e = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        sign_key.alias("bucket"),
    )
    e = _drop_hot_buckets(e, "bucket", max_bucket)
    # explicit count ⇒ AQE-coalesce-exempt (see docstring); both join
    # sides inherit the bucket partitioning, so no extra exchange
    e = e.repartition(nparts, "bucket")
    e = e.persist()  # self-join below (see minhash_lsh_pairs)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket")
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(F.transform(F.col(c), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    out = (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(dot / (norm("va") * norm("vb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
    if not materialize:
        out._internal_cache = e  # caller-releasable handle (ADVICE r14)
        return out
    return materialize_and_release(out, e, checkpoint_dir=checkpoint_dir)


# ---------------------------------------------------------------------------
# connected components: pair graph → dedup clusters → canonical retention
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    max_driver_edges: int | None = None,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable through ``edges``
    (undirected) — the clustering step that turns near-dup PAIRS into dedup
    GROUPS, so "keep one document per group" is well-defined even when dup
    relations are only pairwise-transitive (a~b, b~c but a≁c directly).

    ``edges``: (src, dst) — direction ignored.  ``nodes``: (id) — must cover
    every endpoint plus any singletons to label.  Returns (id, cluster_id).

    Algorithm: distributed min-label propagation.  Each round every node
    takes min(own label, neighbors' labels); converges in O(graph diameter)
    rounds — near-dup clusters are shallow (diameter ≤ a few hops), so this
    terminates in 2-4 rounds in practice, bounded by ``max_iter``.
    ``checkpoint_dir``: pass a reliable (HDFS/S3) path on a real cluster so
    per-round lineage truncation survives executor loss; None keeps the
    local[]-friendly localCheckpoint (operators/iterate.py).

    Scale shape: each round is ONE join of the label table against the
    symmetric edge list plus ONE min-aggregate keyed by node id; no step
    ever materializes a component's member list on one executor, so a
    10-billion-node pair graph streams through.  Lineage is truncated
    every round with localCheckpoint (at cluster scale use a checkpoint
    dir); the loop stops on the first round whose exact label sum equals
    the previous round's (labels are monotone non-increasing, so an
    unchanged sum IS the fixpoint) — a 1-row scalar action moving only a
    decimal to the driver, never data.

    Small-graph regime (r15 optimization round): near-dup pair graphs are
    SPARSE — every caller in this repo feeds edges from an already-
    materialized pairs operator, and the edge count is orders of magnitude
    below the doc count (621 pairs / 11k docs at sf0.1; 31k at sf10).  When
    the edge list fits comfortably on the driver (``max_driver_edges``,
    default 100k rows ≈ a few MB, env ``SPARK_GRAFT_CC_DRIVER_EDGES``; 0
    disables), the min-label fixpoint runs as a driver-side union-find and
    the (id, label) table ships back — the same move as a broadcast join:
    collect the provably-small side, skip the iterative shuffles (guide
    §3.1; the k-centroid kmeans collect adjudicated at r13 is the same
    class).  One count() probe decides the regime — the edge frame is
    lineage-truncated first when the caller did not already do so, so the
    probe's work is reused by whichever regime runs (ADVICE r15: the bare
    count used to execute span_dedup_clusters' whole banded pipeline an
    extra time).  Above the cap, the distributed loop below runs unchanged —
    the sf10 span-CC evidence (33 M edges, 302 s) is loop-regime.  The
    driver regime additionally requires integral node ids (ADVICE r15: the
    collect casts to long; non-numeric ids go to the loop, which only needs
    orderable ids).  Labels are identical by construction: both regimes
    assign every touched node the exact minimum reachable id.
    """
    if max_driver_edges is None:
        max_driver_edges = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "100000"))
    # Driver regime requires INTEGRAL node ids (ADVICE r15): the union-find
    # collects ids cast to long, so a non-numeric id would cast to NULL and
    # silently label every node a singleton.  Non-integral ids skip the
    # probe entirely and run the distributed loop, which only needs
    # orderable ids.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    _integral = (ByteType, ShortType, IntegerType, LongType)
    ids_integral = all(
        isinstance(edges.schema[c].dataType, _integral) for c in ("src", "dst")
    )
    if max_driver_edges > 0 and ids_integral:
        # Materialize edges BEFORE the probe count unless the caller already
        # handed a checkpoint leaf (ADVICE r15: span_dedup_clusters feeds an
        # UNmaterialized banded-join pipeline — 33 M edges / ~158 s at sf10 —
        # which the bare count() executed a whole extra time just to decide
        # the regime).  The blocks are reused by whichever regime runs: the
        # driver collect below, or the loop's sym union (which reads edges
        # TWICE).
        from .iterate import truncate_if_needed

        edges = truncate_if_needed(edges)
    if max_driver_edges > 0 and ids_integral and edges.count() <= max_driver_edges:
        rows = edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        ).collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for src, dst in rows:
            if src not in parent:
                parent[src] = src
            if dst not in parent:
                parent[dst] = dst
            ra, rb = find(src), find(dst)
            if ra != rb:
                # union by MIN root id — the root IS the component label
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        spark = edges.sparkSession
        labels = spark.createDataFrame(
            [(n, find(n)) for n in parent], "id long, label long"
        )
        singletons = nodes.join(labels.select("id"), "id", "left_anti").select(
            "id", F.col("id").alias("label")
        )
        out = labels.unionByName(singletons)
        return out.select("id", F.col("label").alias("cluster_id"))

    sym = edges.select(F.col("src").alias("node"), F.col("dst").alias("neigh")).unionAll(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("neigh"))
    )
    # Co-partition + pre-sort the edge table ON THE JOIN KEY before caching
    # (iterate.loop_join_cache).  Each round is its own ACTION (the
    # convergence check), so cross-round exchange reuse never applies: a
    # plain persist() left every round's sort-merge join re-shuffling AND
    # re-sorting the full symmetric edge list (measured at sf10: 66.3M rows
    # / 526 MB shuffle-written per round, six rounds — the dominant repeated
    # cost in the report's stage profile; 5.1 MB/round after).  Per-round
    # shuffle is now O(|labels|) + the aggregate exchange — at
    # 1000-executor scale the edge list is paid for ONCE, not per round.
    sym = loop_join_cache(sym, "neigh")
    # Iterate ONLY over nodes that appear in an edge: in a dedup corpus the
    # overwhelming majority of docs are singletons, and carrying them through
    # every round's join+shuffle would dominate the cost at scale.  They are
    # unioned back (label = self) after convergence.
    # Round 1 is FUSED into initialization: label(v) = min(v, N(v)) is one
    # map-side-combined aggregate over the symmetric edge list — no join —
    # and it doubles as the distinct-touched-nodes computation.  Each later
    # round is ONE join + ONE aggregate (propagated neighbor labels unioned
    # with current labels, min per node) instead of the classic
    # join+agg+join update; convergence is detected by comparing the
    # monotone non-increasing label SUM (exact decimal) against the
    # previous round — the scalar action that also materializes the lazy
    # checkpoint, with no change-flag join.  One fewer shuffle per round at
    # any scale, ~40% less fixed cost per round at toy scale (VERDICT r4
    # item 6).
    try:
        labels = (
            sym.groupBy("node")
            .agg(F.min("neigh").alias("mn"))
            .select(F.col("node").alias("id"), F.least(F.col("node"), F.col("mn")).alias("label"))
        )
        labels = truncate_lineage(labels, checkpoint_dir)

        def _round(cur_labels: DataFrame) -> DataFrame:
            prop = sym.join(cur_labels, sym.neigh == cur_labels.id).select("node", "label")
            nxt = (
                prop.unionByName(cur_labels.select(F.col("id").alias("node"), "label"))
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .select(F.col("node").alias("id"), "label")
            )
            return truncate_lineage(nxt, checkpoint_dir)

        if ids_integral:
            label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
            prev = labels.agg(label_sum).first()[0]
            if prev is not None:  # empty graph: skip the loop, labels is 0-row
                for _ in range(max_iter - 1):
                    labels = _round(labels)
                    cur = labels.agg(label_sum).first()[0]
                    if cur == prev:  # equal sum of non-increasing labels ⇒ fixpoint
                        break
                    prev = cur
        else:
            # Non-numeric (orderable) ids — ADVICE r15/r16: the decimal-sum
            # fixpoint check would CAST-error (or silently truncate) here,
            # so use the exact formulation directly: labels only ever
            # decrease, so fixpoint ⇔ no (id, label) row changed.  The
            # anti-join count is also the full action that materializes the
            # round's lazy checkpoint (take(1)-style probes would leave it
            # partial).
            if labels.count() > 0:  # the count also materializes the init
                for _ in range(max_iter - 1):
                    old = labels
                    labels = _round(labels)
                    changed = labels.join(
                        old.select("id", "label"), ["id", "label"], "left_anti"
                    ).count()
                    if changed == 0:
                        break
        singletons = nodes.join(labels.select("id"), "id", "left_anti").select(
            "id", F.col("id").alias("label")
        )
        out = labels.unionByName(singletons)
    finally:
        # the per-round convergence actions have already materialized the
        # final labels checkpoint, so the result never re-reads sym —
        # release it even if a round raises (cache hygiene, VERDICT r13
        # item 4)
        sym.unpersist()
    return out.select("id", F.col("label").alias("cluster_id"))


def dedup_clusters(docs: DataFrame, every: int = 10) -> DataFrame:
    """End-to-end near-dup clustering on the planted corpus: MinHash+LSH
    pairs → connected components → (doc_id, cluster_id) for every doc
    (singletons label themselves)."""
    corpus = planted_near_dup_corpus(docs, every=every)
    pairs = minhash_lsh_pairs(corpus)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    nodes = corpus.select(F.col("doc_id").alias("id"))
    return connected_components(edges, nodes).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def keep_canonical(clusters: DataFrame) -> DataFrame:
    """Retention decision from the clustering: keep exactly the canonical
    (minimum-id) document of each cluster — the final 'deduplicated corpus'
    row set.  Shuffle-free on top of ``clusters``: the canonical doc is by
    construction the one whose id equals its cluster label."""
    return clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")


# ---------------------------------------------------------------------------
# fuzzy record linkage (edit-distance matching via deletion neighborhoods)
# ---------------------------------------------------------------------------


def _deletion_variants(name, d: int):
    """``array<string>`` of every string obtainable from ``name`` by deleting
    between 0 and ``d`` single characters (the FastSS deletion neighborhood;
    Bocek/Hunt/Stiller, "Fast Similarity Search in Large Dictionaries",
    U. Zurich TR ifi-2007.02).  Built layer-by-layer with ``transform``
    lambdas so the expression tree stays O(d) deep regardless of string
    length — the per-row work is |Sigma C(len,k)| string builds at runtime,
    not a generated literal per variant (the codegen-blowup pitfall the old
    banding code documented)."""
    layer = F.array(name)
    acc = layer
    for _ in range(d):
        layer = F.array_distinct(
            F.flatten(
                F.transform(
                    layer,
                    lambda v: F.when(
                        F.length(v) >= 1,
                        F.transform(
                            # 1-based deletion position; sequence(1, 0) would
                            # DESCEND in Spark, so guard empty strings above
                            F.sequence(F.lit(1), F.length(v)),
                            lambda i: F.concat(
                                v.substr(F.lit(1), i - 1),
                                v.substr(i + 1, F.length(v)),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        )
        acc = F.concat(acc, layer)
    return F.array_distinct(acc)


def fuzzy_name_pairs(
    records: DataFrame,
    probes: DataFrame,
    max_dist: int = 1,
    probe_regime: str = "auto",
    broadcast_cap_bytes: int = 128 << 20,
) -> DataFrame:
    """Edit-distance record linkage: for every probe, find records whose
    ``name`` is within levenshtein ``max_dist`` (default 1), excluding self.

    Candidate generation is a deletion-neighborhood join (FastSS: each side
    emits every variant reachable by deleting 0..d characters; candidates
    are pairs sharing a variant verbatim), replacing the r3-r11 PassJoin
    positional banding.  Recall proof: fix an optimal edit script for a
    pair with ed <= d; delete from BOTH strings the two characters of every
    substitution, from the record the character of every record-side
    deletion, and from the probe the character of every insertion.  What
    survives on each side is exactly the aligned matching characters, in
    order — the same string, reached with <= d deletions per side.  Exact
    levenshtein then restores precision (sharing a variant only bounds the
    distance by 2d).

    Why not banding: positional-block keys degenerate on corpora whose keys
    share a constant region (the round-11 sf10 finding, SCALE_EVIDENCE.md
    r11 finding 2 — every TPC-H name starts 'Customer#', so one band bucket
    held the whole 1.5M-row corpus and candidate generation went quadratic).
    The designed two-level fix (ROADMAP round-12) was checked on paper first
    and REJECTED: at d=2 (blocks of 6, complement sub-blocks of 4 on the
    18-char names) the composite key for block 0 is ('Custom', 'er#0') —
    both components inside the 9-char constant prefix, so the degeneracy
    reproduces one level down, and pairs with both edits in the trailing
    digits match ONLY via that bucket (it cannot be dropped without losing
    recall).  Deletion-neighborhood keys are the FULL variant string, so a
    constant region can never create a hot bucket — two rows collide only
    when they agree everywhere outside <= 2d deleted positions, i.e. only
    genuine near-duplicates, which the full-recall quadratic oracle demands
    as candidates anyway.

    Scale shape: candidate generation runs at DISTINCT-NAME level — the
    corpus's distinct names emit Sigma_{k<=d} C(len,k) variants each (19 at
    len=18/d=1, 172 at d=2), join the broadcast probe variants, dedupe and
    levenshtein-verify per (probe, name), and only then expand back to
    physical rows with one corpus-sized equi-join on name.  Real linkage
    corpora are duplicate-heavy (the sf10 scale fixture replicates each
    name ~100x), and every stage before the expansion shrinks by that
    factor: measured at sf10 d=2, the row-level formulation shuffled a
    433 M-row candidate dedupe (208 s); name-level cuts the variant-join
    output ~100x while the expansion join just streams out the final
    answer.  On a unique-name corpus the name distinct is a no-op in rows
    and costs two small shuffles of the UNEXPLODED corpus — noise next to
    the 172x variant fan-out it moves behind the distinct.  Identity
    semantics are preserved exactly by the expansion: two record rows
    sharing a name (even fully identical rows — same key AND name, which
    the per-row quadratic oracle counts twice, ADVICE r10) each join back
    and emit their own output row.  The explicit repartition before the
    explode guards the AQE byte-light/compute-heavy pitfall (a post-
    distinct coalesce would serialize the 172x fan-out onto 1-2 tasks).
    Intended regime is name-like keys (len <~ 64, d <= 2: <= ~2k
    variants/row); C(len,d) makes long-document use the wrong tool — use
    dedup_ngram_pairs there.

    Probe-side regime (VERDICT r12 item 4): the probes x variants side is
    broadcast when small (the linkage-probe use case — corpus never
    shuffles), but a LARGE probe set's variant fan-out (172x at d=2) can
    exceed what a driver/executor can hold.  ``probe_regime``:

    - ``"auto"`` (default): one count+max(length) aggregate over the
      UNEXPLODED probe side (cheap by regime definition — probes are the
      small side; pass an explicit regime to skip even that) estimates the
      serialized variant bytes as n_probes x Sigma_{k<=d} C(maxlen,k) x
      (2*maxlen + 48); above ``broadcast_cap_bytes`` (default 128 MiB) it
      falls back to ``"shuffle"``.
    - ``"broadcast"``: force the original plan (corpus never shuffles).
    - ``"shuffle"``: a shuffle-hash join on ``vk`` with the probe side as
      build — BOTH sides shuffle on the variant key (the price of a big
      probe set), but no single node ever holds the full probe fan-out;
      variant keys are full strings, so the vk shuffle cannot hot-bucket
      on corpus-constant regions (same argument as candidate generation).

    Returns (probe_key, match_key, dist) with dist <= max_dist.
    """
    import math

    if probe_regime not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            f"fuzzy_name_pairs: unknown probe_regime {probe_regime!r} "
            "(expected 'auto', 'broadcast', or 'shuffle')"
        )
    d = max_dist
    if probe_regime == "auto":
        stats = probes.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.length("name")).alias("maxlen")
        ).first()
        n_probes, maxlen = stats["n"], stats["maxlen"] or 0
        n_variants = n_probes * sum(math.comb(maxlen, k) for k in range(d + 1))
        est_bytes = n_variants * (2 * maxlen + 48)
        probe_regime = "broadcast" if est_bytes <= broadcast_cap_bytes else "shuffle"
    nparts = records.sparkSession.sparkContext.defaultParallelism
    b = (
        records.select("name")
        .distinct()
        .repartition(nparts)
        .select(
            F.col("name").alias("match_name"),
            F.explode(_deletion_variants(F.col("name"), d)).alias("vk"),
        )
    )
    a = probes.select(
        "probe_key",
        F.col("name").alias("probe_name"),
        F.explode(_deletion_variants(F.col("name"), d)).alias("vk"),
    )
    joined = (
        b.join(F.broadcast(a), "vk")
        if probe_regime == "broadcast"
        # build side = probes (hinted); both sides shuffle on vk
        else b.join(a.hint("shuffle_hash"), "vk")
    )
    cand = (
        joined
        # a (probe, name) pair is reached through every variant the two
        # sides share (a dist-0 pair shares ALL of them) — collapse before
        # the verify, keyed on the name, not any record identity
        .dropDuplicates(["probe_key", "match_name"])
        .withColumn("dist", F.levenshtein("probe_name", "match_name"))
        .where(F.col("dist") <= max_dist)
        .select("probe_key", "match_name", "dist")
    )
    return (
        # expansion: every physical record ROW carrying a matched name is
        # its own linkage match (the self-pair exclusion is by KEY, so it
        # must happen here, where keys exist — a record sharing the
        # probe's name under a different key stays)
        cand.join(records, cand["match_name"] == records["name"])
        .where(F.col("probe_key") != F.col("match_key"))
        .select("probe_key", "match_key", F.col("dist").cast("bigint").alias("dist"))
    )


def planted_fuzzy_variants(probes: DataFrame) -> DataFrame:
    """Known-distance neighbors of each probe name, for recall testing:
    a double substitution (dist 2, same length), a first-char deletion and a
    front insertion (dist 1 each, but with SHIFTED alignment — the case the
    old equal-length half-string banding provably missed).  Key offsets keep
    the planted rows disjoint from real custkeys.  Every transform is
    replayed verbatim by the oracle SQL, so a Spark-side recall miss on any
    variant is a hash mismatch, not a silent drop."""
    return (
        probes.select(
            (F.col("probe_key") + 2_000_000).alias("match_key"),
            F.concat(F.lit("ZZ"), F.expr("substring(name, 3)")).alias("name"),
        )
        .unionByName(
            probes.select(
                (F.col("probe_key") + 3_000_000).alias("match_key"),
                F.expr("substring(name, 2)").alias("name"),
            )
        )
        .unionByName(
            probes.select(
                (F.col("probe_key") + 4_000_000).alias("match_key"),
                F.concat(F.lit("Q"), F.col("name")).alias("name"),
            )
        )
    )


def dedup_retention_report(docs: DataFrame, every: int = 10) -> DataFrame:
    """End-to-end dedup pipeline census on the planted corpus — the single
    report row a curation run emits: corpus size, exact-duplicate
    redundancy, near-dup candidate pairs, multi-member cluster count,
    canonical survivors, and the retention rate.

    Composes the whole stack (exact digest census → MinHash+LSH pairs →
    connected components → canonical retention) without ever collecting:
    each census number is a 1-row aggregate cross-joined into the report.
    Returns (n_docs, n_exact_redundant, n_near_pairs, n_multi_clusters,
    n_kept, retention_rate).

    Census fusion (r13, VERDICT r12 item 3): the report reads the corpus
    TWICE total (digest census + the LSH signature pipeline) and the
    cluster table ONCE — n_docs rides the digest census (n_total), and
    n_multi_clusters/n_kept share one cluster-size aggregate.  n_kept =
    number of clusters is exactly keep_canonical's invariant (CC labels
    are min-member ids, so each cluster keeps precisely the one member
    whose id equals its label); the oracle still computes it the literal
    way (count of doc_id = cluster_id rows), so any violation is a hash
    mismatch.  At 100 TB that is one full corpus pass and one cluster
    shuffle saved; at bench scale it also trims the report's Spark job
    count, the figure its box-weather sensitivity scales with.
    """
    corpus = planted_near_dup_corpus(docs, every=every)
    # one digest pass yields both corpus size and exact redundancy
    exact = exact_dedup_stats(corpus).select(
        F.col("n_total").alias("n_docs"),
        F.col("n_redundant").alias("n_exact_redundant"),
    )
    # ONE pair computation feeds both the census and the clustering (the
    # naive compose ran the whole shingle→LSH pipeline twice — measured 2×).
    # minhash_lsh_pairs materializes its result (executor-local checkpoint
    # blocks) and releases its own signature cache, so no extra persist
    # here — the r13 persist was a second, session-pinned copy of the same
    # rows (VERDICT r13 item 4).  Blocks are ContextCleaner-managed.
    pairs = minhash_lsh_pairs(corpus)
    n_pairs = pairs.agg(F.count("*").alias("n_near_pairs"))
    clusters = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        corpus.select(F.col("doc_id").alias("id")),
    ).select(F.col("id").alias("doc_id"), "cluster_id")
    # one cluster-size aggregate yields both census numbers
    cluster_census = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("sz"))
        .agg(
            F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).alias("n_multi_clusters"),
            F.count("*").alias("n_kept"),
        )
    )
    return (
        exact.crossJoin(n_pairs)
        .crossJoin(cluster_census)
        .select(
            F.col("n_docs").cast("bigint"),
            F.col("n_exact_redundant").cast("bigint"),
            F.col("n_near_pairs").cast("bigint"),
            F.col("n_multi_clusters").cast("bigint"),
            F.col("n_kept").cast("bigint"),
            F.round(F.col("n_kept").cast("double") / F.col("n_docs").cast("double"), 6).alias(
                "retention_rate"
            ),
        )
    )


def ngram_containment_pairs(corpus: DataFrame, pairs: DataFrame, ngram: int = 3) -> DataFrame:
    """EXACT n-gram containment for candidate pairs — the asymmetric
    measure Jaccard misses: containment(A→B) = |A∩B| / |A| detects that a
    short document is a quote/excerpt/prefix of a long one even when their
    Jaccard is low (the long side dilutes the union).  The standard second
    verify stage for training-corpus decontamination and quote collapse.

    Both directions are emitted as EXACT parts-per-million integers
    ((|A∩B|·10⁶) div |A|) — no float ratio to round differently anywhere.
    Same join shape as ngram_jaccard_pairs: candidates (from LSH banding)
    join the deduped shingle arrays twice; set ops are JVM array functions.

    The intersection appears in THREE output expressions on purpose:
    whole-stage-codegen subexpression elimination evaluates the common
    ``array_intersect`` once (verified r15 by interleaved A/B at sf0.1
    against a compute-once rewrite — identical wall, identical rows; see
    SCALE_EVIDENCE.md), so the readable form costs nothing.
    """
    grams = corpus.select(
        "doc_id", F.array_distinct(_word_ngrams(F.col("text"), ngram)).alias("grams")
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_common"),
            F.expr(
                "CAST(size(array_intersect(grams_a, grams_b)) AS BIGINT) * 1000000"
                " div greatest(size(grams_a), 1)"
            ).alias("contain_ab_ppm"),
            F.expr(
                "CAST(size(array_intersect(grams_a, grams_b)) AS BIGINT) * 1000000"
                " div greatest(size(grams_b), 1)"
            ).alias("contain_ba_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


def embedding_threshold_sweep(
    embeddings: DataFrame, thresholds: tuple[float, ...] = (0.5, 0.7, 0.9, 0.95, 0.99)
) -> DataFrame:
    """Threshold-tuning report for embedding near-dup: candidate-pair
    counts at several cosine cutoffs from ONE pass over the LSH-bucketed
    pair set (generated once at the loosest threshold; each tighter
    cutoff is a conditional count on the same rows).  This is the sweep a
    pipeline owner runs before committing a dedup threshold — the cost of
    N thresholds is the cost of one.

    Cutoffs compare the 4-dp-rounded cosine (the module contract), so
    both engines count identical pair sets.  Output: one row of
    cumulative counts n_ge_<pct>.
    """
    base = embedding_near_dup_pairs(embeddings, threshold=min(thresholds))
    return base.agg(
        *[
            F.sum((F.col("cosine") >= F.lit(t)).cast("long"))
            .cast("bigint")
            .alias(f"n_ge_{int(round(t * 100))}")
            for t in sorted(thresholds)
        ]
    )


def duplicated_span_census(docs: DataFrame, k: int = 24, anchor_mod: int = 8) -> DataFrame:
    """Exact duplicated-substring detection — the 'ExactSubstr' pass
    training pipelines run after document-level dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"), since
    verbatim boilerplate spans hide inside otherwise-unique documents.

    Every ``k``-char window of every doc is hashed, and a window is
    *selected* as a fingerprint when its hash value satisfies a content
    condition (first 4 hex digits ≡ 0 mod ``anchor_mod``) — content-defined
    anchor selection, the winnowing/CDC trick.  Position-strided selection
    would be ~``anchor_mod``× cheaper to hash but only detects spans whose
    alignment offsets agree mod the stride (a planted-span test caught
    exactly that miss); anchors select the SAME windows inside a shared
    span regardless of where the span sits in each doc.  A shared span of
    s chars carries s−k+1 window hashes, so it is detected with
    probability 1 − (1 − 1/anchor_mod)^(s−k+1) — ≥ 96% at the defaults for
    spans just 2 windows past k, and exact copies always collide on every
    anchor.

    Returns per doc: (doc_id, n_anchors, n_dup_anchors, dup_ppm) over the
    doc's distinct selected fingerprints, dup meaning the fingerprint
    occurs in ≥ 2 distinct docs.  Docs shorter than ``k`` chars (or with
    no selected anchor) are excluded — they are document-level dedup's
    problem, not span-level's.

    Scale shape: hashing every position is a pure narrow map (the CDC
    cost — embarrassingly parallel, zero shuffle).  The hash chain runs as
    ROW-level expressions after an explode of the position sequence, NOT
    inside array higher-order-function lambdas: HOF lambda bodies are
    interpreted per element outside whole-stage codegen, and the first cut
    of this operator (md5 inside transform+filter) measured ~4× slower at
    sf10 for exactly that reason — same lesson as the minhash explode
    rewrite (minhash_signatures docstring).  Anchor filtering drops
    ~(1−1/anchor_mod) of rows before the per-doc distinct, whose map-side
    partial aggregation means the shuffle still carries only the distinct
    (doc_id, 16-hex) anchors.  The distinct-doc count per hash is then a
    COUNT window over the already-distinct rows rather than an aggregate
    joined back to its own input: the join formulation executes the
    scan+hash lineage once per join side (measured 2× wall at sf10 — the
    boilerplate-screen lesson), while the window consumes the distinct's
    shuffle output in a single pass.  Net: ONE scan, three anchor-row
    shuffles ((doc_id, h) distinct → h window → doc_id rollup), no
    all-pairs stage anywhere — the same banded profile as MinHash.  md5
    keeps the oracle engine-identical; a production deployment would swap
    a rolling polynomial hash into the same plan if per-byte hashing ever
    dominates the scan.
    """
    from pyspark.sql import Window as W

    w = _span_anchors(docs, k, anchor_mod)
    # rows are distinct (doc_id, h), so a plain COUNT per h IS the
    # distinct-doc count — no countDistinct (illegal in windows) needed
    return (
        w.withColumn("nd", F.count("*").over(W.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_anchors"),
            F.sum((F.col("nd") >= 2).cast("long")).cast("long").alias("n_dup_anchors"),
        )
        .withColumn("dup_ppm", F.expr("n_dup_anchors * 1000000 DIV n_anchors"))
        .orderBy("doc_id")
    )


def _span_anchors(docs: DataFrame, k: int, anchor_mod: int) -> DataFrame:
    """Distinct (doc_id, h) content-defined span fingerprints shared by the
    census and pair operators (see duplicated_span_census for the full
    selection/plan rationale: explode-first row-level md5, anchor filter,
    map-side-combined distinct; the repartition spreads the skinny doc rows
    before the ~len(text)× explode because input splits are sized for scan
    bytes, not compute)."""
    spread = docs.where(F.length("text") >= k).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    pos = spread.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - F.lit(k - 1))).alias("i"),
    )
    hashed = pos.select(
        "doc_id",
        F.substring(
            F.md5(F.expr(f"CAST(substr(text, i, {k}) AS BINARY)")), 1, 16
        ).alias("h"),
    )
    return (
        hashed.where(
            F.conv(F.substring("h", 1, 4), 16, 10).cast("long") % anchor_mod == 0
        )
        .select("doc_id", "h")
        .distinct()
    )


def duplicated_span_pairs(
    docs: DataFrame,
    k: int = 24,
    anchor_mod: int = 8,
    min_shared: int = 2,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Pair-level ExactSubstr output: which documents share verbatim spans,
    and how many distinct span fingerprints each pair shares — the edge
    list a span-dedup pass feeds into clustering/retention, complementing
    the per-doc census (duplicated_span_census).

    Same content-defined anchor table; pairs form per anchor bucket (the
    classic banded self-join — candidates only among docs that already
    collide on a fingerprint, never all-pairs) and aggregate to
    (doc_a, doc_b, n_shared).  ``min_shared`` ≥ 2 demands two independent
    fingerprint collisions, suppressing the single-window coincidences a
    64-bit truncated hash admits in principle.

    Scale shape: the per-anchor join is quadratic in bucket size, so
    buckets above ``max_bucket`` are dropped from candidate generation
    exactly like the MinHash/SimHash LSH joins (_drop_hot_buckets — a
    corpus-wide boilerplate string is a cluster-killer, and its pairs are
    document-dedup's job anyway); below the cap the join parallelizes
    across buckets.  One extra shuffle over the census: the pair rollup.
    """
    # Truncate the anchor table ONCE, before the hot-bucket count: the
    # content-defined window hashing (explode of every k-char window + md5)
    # is the dominant cost of this operator, and its downstream consumers —
    # the hot-bucket count, the anti-join, and both self-join sides — would
    # otherwise each re-run it (4 full window-hash passes per call,
    # measured at sf0.1; r15 optimization round, guide §1.2/§2.4).  The
    # blocks are the anchor table itself — the same rows the banded join
    # shuffles anyway, so materializing them adds no new scale hazard.
    w = _span_anchors(docs, k, anchor_mod).localCheckpoint(eager=False)
    w = _drop_hot_buckets(w, "h", max_bucket)
    a = w.select(F.col("doc_id").alias("doc_a"), "h")
    b = w.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def span_dedup_clusters(
    docs: DataFrame,
    k: int = 24,
    anchor_mod: int = 8,
    min_shared: int = 2,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Span-level dedup clustering — the third stage of the ExactSubstr
    pipeline (census → pairs → CLUSTERS): documents connected through
    shared-span pairs collapse into groups via the same distributed
    min-label propagation the MinHash pipeline uses
    (:func:`connected_components`), so boilerplate families (mirrors,
    template spins, chained quote-of-a-quote) get one canonical id even
    when only pairwise-transitively related.

    The cluster universe is every doc long enough to carry a span window
    (length ≥ k); docs that pair with nothing label themselves.  Returns
    (doc_id, cluster_id) — feed :func:`keep_canonical` for the retention
    row set, exactly as with the MinHash clusters.

    Scale shape: inherits the banded pair join (hot-bucket-capped,
    never all-pairs) and the CC loop's one-join-one-agg-per-round with
    lineage truncation and sum-fixpoint detection — both scale-measured
    at sf10 (SCALE_EVIDENCE.md: 37 M span pairs in 158 s skew 1.02;
    33 M-edge CC in 302 s).
    """
    pairs = duplicated_span_pairs(
        docs, k=k, anchor_mod=anchor_mod, min_shared=min_shared, max_bucket=max_bucket
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    nodes = docs.where(F.length("text") >= k).select(F.col("doc_id").alias("id"))
    return connected_components(edges, nodes).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
