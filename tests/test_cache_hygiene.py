"""Cache hygiene: operators that persist internal tables must release them.

VERDICT r13 item 4 / ADVICE r13 (medium): the loop operators (bfs_hops,
label_propagation, weighted_sssp, harmonic_closeness) and the self-join
pairs operators (minhash/simhash/embedding, label centroids) persisted an
internal DataFrame and returned a plan referencing it, so every invocation
leaked a session-pinned CacheManager entry.  bench.py runs 190+ queries in
one SparkSession — the leaked caches accumulate, force LRU eviction, and
skew later timings.  The fix: operators either consume their cache inside
(the fixed-point loops, whose per-round actions materialize the result)
or eagerly localCheckpoint the small result and unpersist the inputs
(iterate.materialize_and_release).  These tests pin "no CacheManager entry
survives the operator + its consumption" for every former leak site.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _cache_is_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def clean_cache(spark):
    """Start from an empty CacheManager so the post-assertion is exact."""
    spark.catalog.clearCache()
    assert _cache_is_empty(spark)
    yield spark


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from duckdb_age_spark.sources import read_table

    return read_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from duckdb_age_spark.sources import read_table

    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def edges(spark):
    # a small two-component graph exercising >1 loop round
    rows = [(i, i + 1) for i in range(0, 40)] + [(100 + i, 101 + i) for i in range(0, 20)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_minhash_lsh_pairs_releases_signature_cache(clean_cache, docs):
    from duckdb_age_spark.operators.dedup import minhash_lsh_pairs, planted_near_dup_corpus

    out = minhash_lsh_pairs(planted_near_dup_corpus(docs))
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_simhash_near_pairs_releases_simhash_cache(clean_cache, docs):
    from duckdb_age_spark.operators.dedup import planted_near_dup_corpus, simhash_near_pairs

    out = simhash_near_pairs(planted_near_dup_corpus(docs))
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_embedding_near_dup_pairs_releases_bucket_cache(clean_cache, emb):
    from duckdb_age_spark.operators.dedup import (
        embedding_near_dup_pairs,
        planted_near_dup_embeddings,
    )

    out = embedding_near_dup_pairs(planted_near_dup_embeddings(emb), threshold=0.9)
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_label_centroid_cosines_releases_cell_cache(clean_cache, emb):
    from duckdb_age_spark.operators.similarity import label_centroid_cosines

    out = label_centroid_cosines(emb)
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_connected_components_releases_edge_cache(clean_cache, edges, spark):
    from duckdb_age_spark.operators.dedup import connected_components

    nodes = spark.range(0, 130).select(F.col("id"))
    out = connected_components(edges, nodes)
    assert out.count() == 130
    assert _cache_is_empty(clean_cache)


def test_pipeline_dedup_report_releases_all_caches(clean_cache, docs):
    from duckdb_age_spark.operators.dedup import dedup_retention_report

    row = dedup_retention_report(docs).collect()[0]
    assert row.n_docs > 0
    assert _cache_is_empty(clean_cache)


def test_bfs_hops_releases_adjacency_cache(clean_cache, edges):
    from duckdb_age_spark.operators.graph import bfs_hops

    out = bfs_hops(edges, source=0, max_hops=3)
    assert out.count() == 4  # source + 3 hops down a path graph
    assert _cache_is_empty(clean_cache)


def test_label_propagation_releases_edge_cache(clean_cache, edges):
    from duckdb_age_spark.operators.graph import label_propagation

    out = label_propagation(edges, rounds=2)
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_weighted_sssp_releases_edge_cache(clean_cache, edges):
    from duckdb_age_spark.operators.graph import weighted_sssp

    w = edges.withColumn("w", F.lit(2).cast("long"))
    out = weighted_sssp(w, rounds=3)
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_harmonic_closeness_releases_adjacency_cache(clean_cache, edges):
    from duckdb_age_spark.operators.graph import harmonic_closeness

    out = harmonic_closeness(edges, n_seeds=2, max_hops=2)
    assert out.count() > 0
    assert _cache_is_empty(clean_cache)


def test_graph_loops_release_cache_even_on_error(clean_cache, spark):
    """try/finally coverage: a failure mid-loop (here: a weight UDF that
    raises during round 1's eager checkpoint) must still unpersist the loop
    cache — the leak would otherwise outlive the error."""
    from duckdb_age_spark.operators.graph import weighted_sssp

    @F.udf("long")
    def boom(x):
        raise ValueError("boom")

    bad = spark.createDataFrame([(1, 2)], "src long, dst long").withColumn("w", boom("src"))
    with pytest.raises(Exception):
        weighted_sssp(bad, rounds=1)
    assert _cache_is_empty(clean_cache)


def test_loop_cache_partitions_rule(spark):
    """VERDICT r13 item 5: the loop cache's partition count is
    max(shuffle.partitions, defaultParallelism) — a cluster that left
    shuffle.partitions at the 200 default still parallelizes the loop table
    across the real executor fleet, and the bench's CPUS=partitions setup
    is unchanged (both terms equal)."""
    from duckdb_age_spark.operators.iterate import loop_cache_partitions, loop_join_cache

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    dp = spark.sparkContext.defaultParallelism
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert loop_cache_partitions(spark) == max(2, dp) == dp
        big = dp * 8
        spark.conf.set("spark.sql.shuffle.partitions", str(big))
        assert loop_cache_partitions(spark) == big
        # the cache itself lands on the chosen N (explicit count wins over conf)
        df = spark.range(0, 100).select(F.col("id").alias("k"))
        cached = loop_join_cache(df, "k", n_partitions=5)
        try:
            assert cached.rdd.getNumPartitions() == 5
        finally:
            cached.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_loop_cache_partitions_non_numeric_conf_falls_back(spark):
    """ADVICE r14: runtimes where spark.sql.shuffle.partitions holds a
    non-integer (e.g. 'auto' when adaptive coalescing owns it) must not
    raise at cache-build time — fall back to defaultParallelism.  OSS
    Spark 4 refuses to SET a non-int value through the session API, so the
    Databricks-style conf is emulated with a stub session."""
    from duckdb_age_spark.operators.iterate import loop_cache_partitions

    class _AutoConf:
        def get(self, key, default=None):
            return "auto"

    class _Stub:
        conf = _AutoConf()
        sparkContext = spark.sparkContext

    assert loop_cache_partitions(_Stub()) == spark.sparkContext.defaultParallelism


def test_materialize_false_exposes_releasable_cache_handle(clean_cache, docs):
    """ADVICE r14 (low): the materialize=False escape hatch must hand the
    caller the pinned internal cache — unpersisting the exposed handle
    empties the CacheManager without a session-wide clearCache."""
    from duckdb_age_spark.operators.dedup import minhash_lsh_pairs, planted_near_dup_corpus

    out = minhash_lsh_pairs(planted_near_dup_corpus(docs), materialize=False)
    assert out.count() > 0
    assert not _cache_is_empty(clean_cache)  # the sig cache is pinned, by design
    out._internal_cache.unpersist()
    assert _cache_is_empty(clean_cache)


def test_materialize_and_release_checkpoint_dir_identical_pairs(
    clean_cache, docs, reliable_ckpt_dir
):
    """VERDICT r14 item 5 / ADVICE r14 (medium): the pairs operators'
    eager materialization accepts a reliable checkpoint_dir (executor-loss
    safety on real clusters); results must be identical to the default
    localCheckpoint path and the internal cache still released."""
    from duckdb_age_spark.operators.dedup import minhash_lsh_pairs, planted_near_dup_corpus

    corpus = planted_near_dup_corpus(docs)
    local = sorted(map(tuple, minhash_lsh_pairs(corpus).collect()))
    reliable = sorted(
        map(tuple, minhash_lsh_pairs(corpus, checkpoint_dir=reliable_ckpt_dir).collect())
    )
    assert local == reliable and len(local) > 0
    assert _cache_is_empty(clean_cache)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_HYGIENE"),
    reason="full-surface sweep (~7 min) — opt in with SPARK_GRAFT_FULL_HYGIENE=1",
)
def test_every_contract_query_leaves_cache_manager_empty(spark):
    """The r14 invariant over the ENTIRE surface, not just the touched
    families: run all 229 contract queries at sf0.001 and assert the
    CacheManager is empty after each — no operator may return a plan that
    pins an internal persist for the session lifetime.

    Swept green in-session on r14 code: 229/229, zero errors, zero
    leakers (ROADMAP round-14 state).  Opt-in because the sweep costs
    ~7 minutes on local[32]; the per-family tests above stay in every
    run and cover the operators that historically persisted internally.
    """
    import __spark_entry__ as entry

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    leakers = []
    for name, fn in entry.queries().items():
        fn(spark, "/root/testdata/sf0.001").count()
        if not cm.isEmpty():
            leakers.append(name)
            spark.catalog.clearCache()
    assert not leakers, f"operators leaking CacheManager entries: {leakers}"
