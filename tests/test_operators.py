"""Operator-level tests over the driver test tables (sf0.001): semantic
properties the oracle comparison can't express (recall of LSH vs brute force,
dedup actually removing rows, session gap invariants, etc.)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from duckdb_age_spark.sources import read_table

    df = read_table(spark, sf_dir, "events").cache()
    yield df
    df.unpersist()


def test_exact_dedup_removes_planted_copies(spark, docs):
    from duckdb_age_spark.operators.dedup import drop_exact_dups

    n = docs.count()
    planted = docs.select("doc_id", "text").unionByName(
        docs.limit(25).select((F.col("doc_id") + 9_000_000).alias("doc_id"), "text")
    )
    deduped = drop_exact_dups(planted)
    assert deduped.count() == n
    # survivor is always the lowest doc_id (the original)
    assert deduped.where(F.col("doc_id") >= 9_000_000).count() == 0


def test_minhash_lsh_finds_planted_pairs(docs):
    from duckdb_age_spark.operators.dedup import minhash_lsh_pairs, planted_near_dup_corpus

    corpus = planted_near_dup_corpus(docs)
    pairs = minhash_lsh_pairs(corpus).collect()
    planted_hits = {r.doc_a for r in pairs if r.doc_b == r.doc_a + 1_000_000}
    # every planted short doc (identical after 30-word truncation) must be found
    short_planted = (
        docs.where((F.col("doc_id") % 10 == 0))
        .where(F.size(F.split(F.trim("text"), r"\s+")) <= 30)
        .count()
    )
    assert len(planted_hits) >= short_planted
    assert all(0.5 <= r.est_jaccard <= 1.0 for r in pairs)


def test_simhash_identical_and_disjoint(spark):
    from duckdb_age_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    vals = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert vals[1] == vals[2]  # identical text → identical simhash


def test_hot_bucket_cap_minhash(spark):
    """A degenerate bucket (60 byte-identical junk docs sharing every band
    signature) must not go quadratic when capped: with max_bucket=10 the
    junk contributes ZERO candidate pairs while a planted true near-dup
    pair living in its own cold bucket is still found.  Uncapped, the same
    corpus produces the full 60·59/2 junk pairs — the cap provably bounds
    candidate count without dropping planted true pairs."""
    from duckdb_age_spark.operators.dedup import minhash_lsh_pairs

    junk = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do") for i in range(60)]
    base = (
        "quick brown fox jumps over the lazy dog while seven wizards brew "
        "strong black coffee at midnight near the old lighthouse"
    )
    df = spark.createDataFrame(
        junk + [(1000, base), (1001, base + " tonight")],
        "doc_id long, text string",
    )
    capped = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(df, max_bucket=10).collect()}
    assert (1000, 1001) in capped, "true pair in a cold bucket was dropped by the cap"
    assert capped == {(1000, 1001)}, f"hot bucket leaked candidates: {capped}"
    uncapped = minhash_lsh_pairs(df).count()
    assert uncapped >= 60 * 59 // 2, "uncapped baseline should include all junk pairs"


def test_hot_bucket_cap_simhash(spark):
    from duckdb_age_spark.operators.dedup import simhash_near_pairs

    junk = [(i, "foo bar baz qux quux corge grault garply waldo fred plugh") for i in range(60)]
    base = (
        "quick brown fox jumps over the lazy dog while seven wizards brew "
        "strong black coffee at midnight near the old lighthouse"
    )
    df = spark.createDataFrame(
        junk + [(1000, base), (1001, base)],
        "doc_id long, text string",
    )
    capped = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(df, max_bucket=10).collect()}
    # identical true pair (hamming 0) survives: even if a junk quarter
    # collides with one of its quarters, the other three are cold
    assert (1000, 1001) in capped
    assert capped == {(1000, 1001)}
    assert simhash_near_pairs(df).count() >= 60 * 59 // 2


def test_hot_bucket_cap_embedding(spark):
    from duckdb_age_spark.operators.dedup import embedding_near_dup_pairs

    # 60 identical all-positive vectors → one hot sign-pattern bucket of
    # mutual cosine-1.0 dups; the true pair has a NEGATIVE first dim so it
    # lives in its own bucket.
    junk_v = [1.0] * 64
    pair_v = [-1.0] + [0.5] * 63
    pair_v2 = [-1.0] + [0.5] * 62 + [0.51]
    rows = [(i, junk_v) for i in range(60)] + [(1000, pair_v), (1001, pair_v2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = {(r.vec_a, r.vec_b) for r in embedding_near_dup_pairs(df, max_bucket=10).collect()}
    assert capped == {(1000, 1001)}
    assert embedding_near_dup_pairs(df).count() >= 60 * 59 // 2


def test_lsh_topk_recall_vs_bruteforce(emb):
    from duckdb_age_spark.operators.similarity import brute_force_topk, lsh_topk, queries_from_ids

    q = queries_from_ids(emb, [0, 1, 2, 3, 4])
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = lsh_topk(emb, q, k=5, n_planes=4).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"LSH recall {recall} collapsed"
    # approx scores must be true cosines (subset of scored universe, same rounding)
    exact_scores = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_kmeans_ivf_trains_and_beats_or_matches_untrained(emb):
    from duckdb_age_spark.operators.similarity import (
        brute_force_topk,
        kmeans_ivf_topk,
        queries_from_ids,
    )

    q = queries_from_ids(emb, [0, 1, 2, 3, 4])
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = kmeans_ivf_topk(emb, q, k=5, n_lists=8, n_probe=2, n_iters=2).collect()
    # contract shape: exactly k rows per query, ranks 1..k
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"k-means IVF recall {recall} collapsed"
    # determinism: re-running training yields identical output
    again = kmeans_ivf_topk(emb, q, k=5, n_lists=8, n_probe=2, n_iters=2).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_kmeans_fused_lloyd_matches_default(emb):
    """VERDICT r15 item 7: the flagged shuffle-free Lloyd training pass
    (one mapInPandas per iteration, partials merged on the driver) must be
    BIT-IDENTICAL to the default assign+recenter aggregate chain on the
    fixtures — same centroids after training, hence same final top-k."""
    from duckdb_age_spark.operators.similarity import kmeans_ivf_topk, queries_from_ids

    q = queries_from_ids(emb, [0, 1, 2, 3, 4])
    default = kmeans_ivf_topk(emb, q, k=5, n_iters=2, fused_lloyd=False).collect()
    fused = kmeans_ivf_topk(emb, q, k=5, n_iters=2, fused_lloyd=True).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, fused))


def test_round_half_up_6_matches_spark_round(spark):
    """The fused Lloyd path's Python rounding must replicate F.round(x, 6)
    (BigDecimal HALF_UP over the exact binary double) including negatives
    and exact .5e-6 boundaries."""
    from duckdb_age_spark.operators.similarity import _round_half_up_6

    vals = [
        0.1234565, -0.1234565, 0.9999995, -0.9999995, 1.0000004999,
        0.12345649999, -2.5e-6, 2.5e-6, 0.0, 1.0, -1.0, 0.3333333333,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    assert got == [_round_half_up_6(v) for v in vals]


def test_sessionize_gap_invariant(events):
    from duckdb_age_spark.operators.events import sessionize

    s = sessionize(events, gap_minutes=30).cache()
    # within a session, no gap exceeds 30 min; session_seq is monotone per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "session_seq").orderBy("ts")
    gaps = s.withColumn("gap", F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
    assert gaps.where(F.col("gap") > 1800).count() == 0
    # first event of every user is session 1
    firsts = s.groupBy("user_id").agg(F.min("session_seq").alias("m"))
    assert firsts.where(F.col("m") != 1).count() == 0


def test_funnel_subset_of_users_with_all_three(events):
    from duckdb_age_spark.operators.events import user_funnel

    out = user_funnel(events)
    completed = out.where("completed_funnel").count()
    with_all = (
        events.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("ts"))
        .where(F.array_contains("ts", "signup") & F.array_contains("ts", "view") & F.array_contains("ts", "purchase"))
        .count()
    )
    assert 0 < completed <= with_all


def test_multimodal_feature_schema_and_determinism(spark, docs):
    from duckdb_age_spark.operators.multimodal import documents_as_media, extract_features

    feats = extract_features(documents_as_media(docs))
    a = {r.media_id: (r.digest, r.width, r.height) for r in feats.collect()}
    b = {r.media_id: (r.digest, r.width, r.height) for r in feats.collect()}
    assert a == b and len(a) == docs.count()
    assert all(16 <= w <= 1024 and 16 <= h <= 1024 for (_, w, h) in a.values())


def test_multimodal_stub_raises_on_empty():
    from duckdb_age_spark.operators.multimodal import decode_image_stub

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"")


def test_multimodal_payload_properties_large_and_edge(spark):
    """Payload-level property check (VERDICT r1 item 6): digest/byte_len
    computed by the mapInPandas path must equal hashlib/len ground truth for
    real binary payloads — multi-chunk-sized (≥64 KiB), exactly-64-KiB,
    1-byte, empty, and NULL — not just the small documents fixture."""
    import hashlib

    from duckdb_age_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    payloads = {
        1: bytes(range(256)) * 512,            # 128 KiB, all byte values
        2: b"\x00" * (64 * 1024),              # exactly one chunk of zeros
        3: b"\xff",                            # single byte
        4: b"",                                # empty
        5: None,                               # NULL
    }
    rows = [(i, "image/fake", p, "{}") for i, p in payloads.items()]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)
    got = {r.media_id: r for r in extract_features(media).collect()}
    assert set(got) == set(payloads)
    for i, p in payloads.items():
        r = got[i]
        if p is None:
            assert r.byte_len == 0 and r.digest is None
            continue
        assert r.byte_len == len(p)
        assert r.digest == hashlib.md5(p).hexdigest()
        if p:
            assert r.width == (p[0] % 64 + 1) * 16 and r.height == (p[-1] % 64 + 1) * 16
        else:
            assert r.width is None and r.height is None


def test_bmp_wav_codec_roundtrip_property():
    """Property sweep (hypothesis): decode(encode(w, h)) == (w, h) and the
    container size formula holds for ARBITRARY geometry, not just the
    fixture-derived shapes; same for WAV.  Also: every strict prefix of a
    valid container must be rejected, never mis-decoded."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from duckdb_age_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=200),
        h=st.integers(min_value=1, max_value=200),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def bmp_prop(w, h, seed):
        payload = encode_bmp(w, h, seed=seed)
        assert decode_bmp(payload) == (w, h)
        assert len(payload) == 54 + ((3 * w + 3) // 4 * 4) * h
        with pytest.raises(ValueError):
            decode_bmp(payload[:-1])

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=5000),
        rate=st.sampled_from([8000, 16000, 44100, 48000]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def wav_prop(n, rate, seed):
        payload = encode_wav(n, rate, seed=seed)
        assert decode_wav(payload) == (rate, n)
        assert len(payload) == 44 + 2 * n
        with pytest.raises(ValueError):
            decode_wav(payload[:-1])

    bmp_prop()
    wav_prop()


def test_bmp_resize_property():
    """resize(encode(w, h)) stays a valid BMP with the documented geometry
    for arbitrary inputs and factors."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from duckdb_age_spark.operators.multimodal import decode_bmp, encode_bmp, resize_bmp

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=120),
        h=st.integers(min_value=1, max_value=120),
        factor=st.integers(min_value=1, max_value=5),
    )
    def prop(w, h, factor):
        small = resize_bmp(encode_bmp(w, h, seed=w * h), factor=factor)
        assert decode_bmp(small) == (max(1, w // factor), max(1, h // factor))

    prop()


def test_bmp_wav_codec_roundtrip():
    """Pure-Python codec pair: decode(encode(...)) recovers the geometry for
    a sweep of shapes including the 4-byte row-padding corners (width % 4
    in every residue class)."""
    from duckdb_age_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    for w in (1, 2, 3, 4, 5, 63, 64):
        for h in (1, 7, 64):
            payload = encode_bmp(w, h, seed=w * h)
            assert decode_bmp(payload) == (w, h)
            # exact container size: 54-byte headers + padded rows
            assert len(payload) == 54 + ((3 * w + 3) // 4 * 4) * h
    for n in (1, 2, 999, 1000):
        for rate in (8000, 44100):
            payload = encode_wav(n, rate, seed=n)
            assert decode_wav(payload) == (rate, n)
            assert len(payload) == 44 + 2 * n


def test_bmp_wav_decode_rejects_malformed():
    from duckdb_age_spark.operators.multimodal import decode_bmp, decode_wav, encode_bmp, encode_wav

    with pytest.raises(ValueError):
        decode_bmp(b"")
    with pytest.raises(ValueError):
        decode_bmp(b"PN" + b"\x00" * 60)  # wrong magic
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(10, 10)[:53])  # truncated header
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(10, 10)[:-1])  # truncated pixel data
    with pytest.raises(ValueError):
        decode_wav(b"")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + b"\x00" * 50)  # bad WAVE magic
    with pytest.raises(ValueError):
        decode_wav(encode_wav(100)[:-1])  # truncated samples


def test_resize_bmp_halves_geometry_and_revalidates():
    from duckdb_age_spark.operators.multimodal import decode_bmp, encode_bmp, resize_bmp

    for w, h in [(10, 8), (1, 1), (63, 7), (2, 64)]:
        small = resize_bmp(encode_bmp(w, h, seed=3), factor=2)
        nw, nh = decode_bmp(small)  # output must itself be a valid BMP
        assert (nw, nh) == (max(1, w // 2), max(1, h // 2))
        assert len(small) == 54 + ((3 * nw + 3) // 4 * 4) * nh
    with pytest.raises(ValueError):
        resize_bmp(b"not a bmp", factor=2)


def test_resize_preserves_pixels_nearest_neighbor():
    from duckdb_age_spark.operators.multimodal import encode_bmp, resize_bmp
    import struct as st

    big = encode_bmp(4, 4, seed=9)
    small = resize_bmp(big, factor=2)
    off_big = st.unpack_from("<I", big, 10)[0]
    off_small = st.unpack_from("<I", small, 10)[0]
    row_big = (3 * 4 + 3) // 4 * 4
    row_small = (3 * 2 + 3) // 4 * 4
    # sampled pixel (y, x) of the output equals source pixel (2y, 2x)
    for y in range(2):
        for x in range(2):
            src = big[off_big + 2 * y * row_big + 2 * x * 3:][:3]
            dst = small[off_small + y * row_small + x * 3:][:3]
            assert src == dst


def test_audio_features_match_ground_truth():
    from duckdb_age_spark.operators.multimodal import encode_wav
    import struct as st

    seed, n = 7, 500
    payload = encode_wav(n, 8000, seed=seed)
    samples = st.unpack_from("<%dh" % n, payload, 44)
    expected = [((seed + i) * 257) % 4096 - 2048 for i in range(n)]
    assert list(samples) == expected  # encoder writes the documented wave


def test_multimodal_real_decode_pipeline(spark, docs):
    """End-to-end mapInPandas decode over synthesized real containers:
    every row decodes 'real', poison payloads degrade to an error ROW
    (never a failed stage)."""
    from duckdb_age_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
        synthesize_media,
    )

    out = decode_features(synthesize_media(docs.limit(40))).collect()
    assert len(out) == 40
    for r in out:
        assert r.decode_ok == "real"
        if r.kind == "image/bmp":
            assert r.width == r.media_id % 64 + 1
            assert r.height == (r.media_id * 7) % 64 + 1
            assert r.sample_rate is None
        else:
            assert r.kind == "audio/wav"
            assert r.sample_rate == 8000
            assert r.duration_ms == (r.media_id % 1000 + 1) * 1000 // 8000
            assert r.width is None
    # poison payloads: wrong magic, truncated, empty, NULL
    bad = spark.createDataFrame(
        [
            (1, "image/bmp", b"not a bmp at all, definitely not" + b"\x00" * 40, "{}"),
            (2, "audio/wav", b"RIFFxxxx", "{}"),
            (3, "image/bmp", b"", "{}"),
            (4, "video/mp4", b"\x00" * 100, "{}"),
            (5, "audio/wav", None, "{}"),
        ],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in decode_features(bad).collect()}
    assert len(got) == 5
    assert all(r.decode_ok.startswith("error:") for r in got.values())
    assert got[1].decode_ok == "error:bad BMP magic"
    assert got[4].decode_ok == "error:unknown kind video/mp4"


def test_encrypted_sink_roundtrip(spark, tmp_path, manager, docs):
    from duckdb_age_spark.sources import read_encrypted, write_encrypted
    from duckdb_age_spark.contract import KP1

    manager.create_secret("sink_key", public_key=KP1.public_key, private_key=KP1.private_key, replace=True)
    path = str(tmp_path / "enc_docs")
    write_encrypted(docs.limit(50), path, ["text"], recipient="sink_key")

    # on-disk column is ciphertext (age header magic), not plaintext
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes)["text"] == "binary"
    first = raw.select("text").first().text
    assert bytes(first).startswith(b"age-encryption.org/v1")

    back = read_encrypted(spark, path, ["text"], identity="sink_key")
    orig = {r.doc_id: r.text for r in docs.limit(50).collect()}
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == orig


def test_crypto_routing_rule():
    """Pure routing decision (sources/encrypted.py): explicit request
    wins; auto takes the JVM path iff registered AND median payload is at
    or above the measured 64 KiB crossover; asking for an unregistered
    JVM path is a loud error, never a silent fallback."""
    import pytest as _pytest

    from duckdb_age_spark.sources.encrypted import JVM_CROSSOVER_BYTES, choose_crypto_path

    assert choose_crypto_path("auto", True, JVM_CROSSOVER_BYTES) == "jvm"
    assert choose_crypto_path("auto", True, JVM_CROSSOVER_BYTES - 1) == "python"
    assert choose_crypto_path("auto", False, 10 * JVM_CROSSOVER_BYTES) == "python"
    assert choose_crypto_path("python", True, 10 * JVM_CROSSOVER_BYTES) == "python"
    assert choose_crypto_path("jvm", True, 0) == "jvm"
    with _pytest.raises(RuntimeError, match="not registered"):
        choose_crypto_path("jvm", False, 10 * JVM_CROSSOVER_BYTES)
    with _pytest.raises(ValueError):
        choose_crypto_path("fast", True, 0)


def test_effective_manager_resolution_order():
    """Manager dispatch for the routed sink (ADVICE r9): explicit wins,
    then the session's registered manager, then None (-> downstream
    default).  Uses plain objects — the session-attribute marker (ADVICE
    r15: aliasing-proof, unlike the old id()-keyed dict) needs no real
    session."""
    from duckdb_age_spark.register import _REGISTERED_ATTR
    from duckdb_age_spark.sources.encrypted import _effective_manager

    class _FakeSpark:
        pass

    fake_spark, explicit, registered = _FakeSpark(), object(), object()
    assert _effective_manager(fake_spark, explicit) is explicit
    assert _effective_manager(fake_spark, None) is None
    setattr(fake_spark, _REGISTERED_ATTR, registered)
    assert _effective_manager(fake_spark, None) is registered
    assert _effective_manager(fake_spark, explicit) is explicit


def test_register_marker_cannot_alias_new_session():
    """ADVICE r15: the registration marker must live on the session object,
    so a NEW session object can never alias a dead one's entry (the old
    id(spark)-keyed dict did exactly that when CPython reused the address)."""
    from duckdb_age_spark.register import registered_manager

    class _FakeSpark:
        pass

    a = _FakeSpark()
    assert registered_manager(a) is None  # fresh object: never pre-registered


def test_python_crypto_expr_resolves_only_with_explicit_manager(spark, manager):
    """Python-route expression building: without an explicit manager the
    secret NAME rides the plan (the registered UDF resolves it — keeps
    identities out of plan text); with one, resolution happens driver-side
    against THAT manager's snapshot."""
    from duckdb_age_spark.contract import KP1
    from duckdb_age_spark.secrets import SecretManager
    from duckdb_age_spark.sources.encrypted import _python_crypto_expr
    from pyspark.sql import functions as F

    own = SecretManager()
    own.create_secret("pxkey", public_key=KP1.public_key, private_key=KP1.private_key)
    data = F.lit(b"x")
    # name preserved when manager is None
    assert "pxkey" in str(_python_crypto_expr("age_encrypt", data, "pxkey", None))
    # resolved against the explicit manager otherwise (encrypt -> public,
    # decrypt -> private)
    assert KP1.public_key in str(_python_crypto_expr("age_encrypt", data, "pxkey", own))
    assert KP1.private_key in str(_python_crypto_expr("age_decrypt", data, "pxkey", own))
    # raw keys pass through under either mode
    raw = str(_python_crypto_expr("age_encrypt", data, KP1.public_key, own))
    assert KP1.public_key in raw


def test_encrypted_sink_routes_python_without_jvm(spark, tmp_path, manager, docs):
    """In a session without the JVM functions, auto-routing must pick the
    Python path for every payload size and skip the probe (no extra job
    beyond the write itself is required for correctness here — just the
    route)."""
    from duckdb_age_spark.contract import KP1
    from duckdb_age_spark.sources import write_encrypted

    manager.create_secret("route_key", public_key=KP1.public_key, replace=True)
    from pyspark.sql import functions as F

    big = docs.limit(4).select("doc_id", F.rpad("text", 70000, "x").alias("text"))
    routes = write_encrypted(big, str(tmp_path / "enc_route"), ["text"], recipient="route_key")
    assert routes == {"text": "python"}


def test_hash_sample_is_stable_and_stratified(docs):
    from duckdb_age_spark.operators.pipeline import hash_sample_split

    a = hash_sample_split(docs)
    b = hash_sample_split(docs)
    # deterministic: identical membership and splits run-to-run
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    rows = a.groupBy("lang").count().collect()
    total = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in rows:
        rate = r["count"] / total[r["lang"]]
        hi = 0.5 if r["lang"] == "en" else 0.25
        # md5 uniformity: sampled rate within ±60% relative of the threshold
        assert 0.4 * hi <= rate <= 1.6 * hi, (r["lang"], rate)
    # both splits present, eval the minority
    splits = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert set(splits) == {"train", "eval"} and splits["eval"] < splits["train"]


def test_pack_sequences_respects_budget_arithmetic(docs):
    from duckdb_age_spark.operators.pipeline import pack_sequences
    from duckdb_age_spark.operators.text import token_count

    budget = 2048
    bins = pack_sequences(docs, budget).collect()
    # every document is packed exactly once
    assert sum(r["n_docs"] for r in bins) == docs.count()
    # bin ids are contiguous from 0 per language
    by_lang: dict[str, list[int]] = {}
    for r in bins:
        by_lang.setdefault(r["lang"], []).append(r["bin_id"])
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), (lang, ids)
    # a bin overflows the budget by at most one document's tokens
    max_doc = docs.select(F.max(token_count()).alias("m")).first().m
    assert all(r["bin_tokens"] < budget + max_doc for r in bins)


def test_quality_topk_rank_and_ordering(docs):
    from duckdb_age_spark.operators.pipeline import quality_topk

    out = quality_topk(docs, k=5).collect()
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["quality_score"] for r in rows]
        assert scores == sorted(scores, reverse=True), (lang, scores)


def test_upsert_parquet_replaces_and_appends(spark, tmp_path):
    from duckdb_age_spark.sources import upsert_parquet

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    upsert_parquet(spark, path, updates, "k")
    got = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_parquet_is_idempotent(spark, tmp_path):
    from duckdb_age_spark.sources import upsert_parquet

    path = str(tmp_path / "tbl2")
    spark.createDataFrame([(1, 1.0)], "k long, v double").write.parquet(path)
    updates = spark.createDataFrame([(1, 2.0)], "k long, v double")
    upsert_parquet(spark, path, updates, "k")
    upsert_parquet(spark, path, updates, "k")
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0].v == 2.0


def test_upsert_parquet_recovers_from_crashed_swap(spark, tmp_path):
    """A prior run that crashed after renaming path→._old (or left ._staging
    behind) must not wedge the next call (ADVICE r1 item 3)."""
    import os
    import shutil

    from duckdb_age_spark.sources import upsert_parquet

    path = str(tmp_path / "tbl3")
    spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double").write.parquet(path)
    # simulate: crashed mid-swap — table stranded at ._old, stale ._staging
    os.rename(path, path + "._old")
    os.makedirs(path + "._staging")
    updates = spark.createDataFrame([(2, 20.0)], "k long, v double")
    upsert_parquet(spark, path, updates, "k")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 1.0, 2: 20.0}
    assert not os.path.exists(path + "._old") and not os.path.exists(path + "._staging")
    shutil.rmtree(path)


def test_upsert_parquet_dedupes_update_keys(spark, tmp_path):
    """Duplicate keys within updates collapse to one row per key instead of
    inserting both (MERGE can't update the same target row twice)."""
    from duckdb_age_spark.sources import upsert_parquet

    path = str(tmp_path / "tbl4")
    spark.createDataFrame([(1, 1.0)], "k long, v double").write.parquet(path)
    updates = spark.createDataFrame([(1, 5.0), (1, 5.0), (2, 7.0)], "k long, v double")
    upsert_parquet(spark, path, updates, "k")
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 2
    assert {r.k for r in rows} == {1, 2}


def test_dq_single_pass_and_planted_violations(spark):
    from duckdb_age_spark.operators.dq import dq_report, single_pass_violations

    orders = spark.createDataFrame(
        [(1, 10, 5.0), (2, None, -1.0), (3, 99, 7.0)], "o_orderkey long, o_custkey long, o_totalprice double"
    )
    customer = spark.createDataFrame([(10,), (10,), (11,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 1.0, 0.5), (7, -2.0, 1.5)], "l_orderkey long, l_quantity double, l_discount double"
    )
    got = {r.check: r.violations for r in dq_report(orders, customer, lineitem).collect()}
    assert got == {
        "orders_null_custkey": 1,
        "orders_nonpositive_price": 1,
        "lineitem_nonpositive_qty": 1,
        "lineitem_discount_range": 1,
        "customer_dup_key": 1,
        "orders_orphan_custkey": 1,  # custkey 99 (NULL keys don't join, aren't orphans)
        "lineitem_orphan_order": 1,  # orderkey 7
    }
    # intra-table rules really are one scan: a single aggregate node
    from duckdb_age_spark.plans import count_exchanges

    one_pass = single_pass_violations(
        orders, {"a": F.col("o_custkey").isNull(), "b": F.col("o_totalprice") <= 0}
    )
    assert count_exchanges(one_pass) <= 1


def test_hash_sample_threshold_monotonicity(docs):
    """The SCALING.md claim behind md5-prefix sampling: raising a stratum's
    rate keeps every previously sampled row (superset property), so rate
    changes never reshuffle membership."""
    from duckdb_age_spark.operators.pipeline import hash_sample_split

    low = hash_sample_split(docs, {l: "2000" for l in ("en", "de", "fr", "es", "zh")})
    high = hash_sample_split(docs, {l: "8000" for l in ("en", "de", "fr", "es", "zh")})
    assert low.count() < high.count()
    # every low-rate row is in the high-rate sample, with the same split label
    assert low.exceptAll(high).count() == 0


def test_connected_components_chain_and_singletons(spark):
    """Pairwise-transitive chain (1-2, 2-3) must collapse to one cluster even
    though 1~3 was never emitted as a pair; separate components and
    singletons keep their own labels."""
    from duckdb_age_spark.operators.dedup import connected_components, keep_canonical

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (30, 20)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20, 30, 99)], "id long")
    got = {r.id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 30: 20, 99: 99}
    kept = {
        r.doc_id
        for r in keep_canonical(
            connected_components(edges, nodes).select(
                F.col("id").alias("doc_id"), "cluster_id"
            )
        ).collect()
    }
    assert kept == {1, 10, 20, 99}


def test_connected_components_long_path_converges(spark):
    """A 12-node path graph needs ~log-diameter rounds of min propagation;
    the loop must reach the true fixpoint, not stop after one round."""
    from duckdb_age_spark.operators.dedup import connected_components

    n = 12
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, n)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    got = {r.id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_connected_components_driver_and_loop_regimes_agree(spark):
    """r15 optimization round: below ``max_driver_edges`` the min-label
    fixpoint runs as a driver-side union-find; above (or with the cap
    disabled via 0) the distributed loop runs.  Both regimes must assign
    every node the exact minimum reachable id — pinned on a graph with
    merging chains (unions arriving in adverse order), a separate
    component, reversed edge directions, and singletons."""
    from duckdb_age_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 5-4-3-2-1 fed high-to-low, a merge edge (7,2), a separate
        # component with reversed direction, and a self-contained pair
        [(5, 4), (4, 3), (3, 2), (2, 1), (7, 2), (20, 30), (41, 40)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 7, 20, 30, 40, 41, 99)], "id long"
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 7: 1, 20: 20, 30: 20, 40: 40, 41: 40, 99: 99}
    driver = {
        r.id: r.cluster_id
        for r in connected_components(edges, nodes, max_driver_edges=100).collect()
    }
    loop = {
        r.id: r.cluster_id
        for r in connected_components(edges, nodes, max_driver_edges=0).collect()
    }
    assert driver == expected
    assert loop == expected


def test_connected_components_non_integral_ids_use_loop(spark):
    """ADVICE r15: the driver union-find casts ids to long, so NON-NUMERIC
    ids (the operator contract only needs orderable ids) must bypass the
    driver regime — the cast would yield NULLs and silently label every
    node a singleton.  String-id graphs go through the distributed loop and
    still cluster correctly."""
    from duckdb_age_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], "src string, dst string"
    )
    nodes = spark.createDataFrame(
        [(s,) for s in ("a", "b", "c", "x", "y", "z")], "id string"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(edges, nodes, max_driver_edges=100).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_is_lineage_truncated_and_skip(spark):
    """The leaf detector behind truncate_if_needed (VERDICT r15 item 4):
    checkpointed frames — and cheap projections/filters over them — count
    as truncated (re-truncating them is pure overhead); anything with real
    upstream lineage does not."""
    from duckdb_age_spark.operators.iterate import (
        is_lineage_truncated,
        truncate_if_needed,
    )

    base = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    leaf = base.localCheckpoint(eager=False)
    assert is_lineage_truncated(leaf)
    assert is_lineage_truncated(leaf.select("src", "dst"))
    assert is_lineage_truncated(leaf.where("src > 0").select("src"))
    # a leaf (or a projection of one) passes through UNCHANGED
    proj = leaf.select("src", "dst")
    assert truncate_if_needed(proj) is proj
    # real lineage is NOT truncated: joins/aggregates must still checkpoint
    joined = leaf.join(leaf.select(F.col("src").alias("dst2")), leaf.src == F.col("dst2"))
    assert not is_lineage_truncated(joined)
    assert not is_lineage_truncated(base.groupBy("src").count())
    assert truncate_if_needed(joined) is not joined


def test_ngram_decontaminate_flags_overlap_only(spark):
    from duckdb_age_spark.operators.pipeline import ngram_decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different words appear in this training document here"),
            (3, "prefix words then the quick brown fox jumps over everything"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_shared_grams, r.contaminated) for r in ngram_decontaminate(docs, eval_docs, n=5).collect()}
    # doc 1 and 3 share the 5-gram "the quick brown fox jumps"; doc 2 shares none
    assert got[1][1] is True and got[1][0] >= 1
    assert got[3][1] is True
    assert got[2] == (0, False)


def test_unigram_logprob_orders_common_above_rare(spark):
    from duckdb_age_spark.operators.pipeline import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "common common common common"),       # only frequent tokens
            (2, "common rareword"),                   # half rare
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.mean_logprob for r in unigram_logprob(docs).collect()}
    assert got[1] > got[2]  # frequent-token doc scores higher (less negative)


def test_fuzzy_name_pairs_banding_recall(spark):
    """Pigeonhole banding must catch a substitution in EITHER half of the
    string, and exact levenshtein must exclude distance-2 candidates that
    happen to share a band."""
    from duckdb_age_spark.operators.dedup import fuzzy_name_pairs

    rows = [
        (1, "ABCDEFGHIJKLMNOPQR"),
        (2, "XBCDEFGHIJKLMNOPQR"),  # sub in first half → shares second half
        (3, "ABCDEFGHIJKLMNOPQX"),  # sub in second half → shares first half
        (4, "XBCDEFGHIJKLMNOPQX"),  # distance 2 from 1 (shares NO half with 1)
        (5, "ABCDEFGHIXXLMNOPQR"),  # distance 2, shares first half with 1
    ]
    df = spark.createDataFrame(rows, "k long, name string")
    probes = df.where("k = 1").selectExpr("k AS probe_key", "name")
    records = df.selectExpr("k AS match_key", "name")
    got = {(r.probe_key, r.match_key): r.dist for r in fuzzy_name_pairs(records, probes).collect()}
    assert got == {(1, 2): 1, (1, 3): 1}


def test_fuzzy_name_pairs_insert_delete_and_d2_recall(spark):
    """PassJoin banding recall beyond substitutions (VERDICT r2 item 5):
    insert/delete neighbors shift alignment and change length, and at
    max_dist=2 a double edit must still be found — all cases the old
    equal-length half-banding provably missed."""
    from duckdb_age_spark.operators.dedup import fuzzy_name_pairs

    base = "ABCDEFGHIJKLMNOPQR"
    rows = [
        (1, base),
        (2, base[1:]),            # deletion at front (dist 1, shifted)
        (3, "Q" + base),          # insertion at front (dist 1, shifted)
        (4, base[:5] + base[6:]), # deletion mid-string (dist 1)
        (5, "XX" + base[2:]),     # double substitution (dist 2)
        (6, "X" + base[1:9] + "X" + base[10:]),  # two spread substitutions (dist 2)
        (7, "XXX" + base[3:]),    # triple substitution (dist 3 — excluded)
    ]
    df = spark.createDataFrame(rows, "k long, name string")
    probes = df.where("k = 1").selectExpr("k AS probe_key", "name")
    records = df.selectExpr("k AS match_key", "name")
    d1 = {(r.probe_key, r.match_key): r.dist for r in fuzzy_name_pairs(records, probes, max_dist=1).collect()}
    assert d1 == {(1, 2): 1, (1, 3): 1, (1, 4): 1}
    d2 = {(r.probe_key, r.match_key): r.dist for r in fuzzy_name_pairs(records, probes, max_dist=2).collect()}
    assert d2 == {(1, 2): 1, (1, 3): 1, (1, 4): 1, (1, 5): 2, (1, 6): 2}


def test_fuzzy_name_pairs_shared_match_key_keeps_both_rows(spark):
    """Two DISTINCT record rows sharing a match_key are two matches, not
    one: the round-10 full sf1 oracle run caught the candidate dedupe
    collapsing them (replica key offsets collide with the planted-variant
    offsets at that scale).  Both rows sit within dist 1 of the probe, so
    losing either changes the row count."""
    from duckdb_age_spark.operators.dedup import fuzzy_name_pairs

    base = "ABCDEFGHIJKLMNOPQR"
    probes = spark.createDataFrame([(1, base)], "probe_key long, name string")
    records = spark.createDataFrame(
        [(2, "X" + base[1:]), (2, base[:-1] + "X"), (3, base)],
        "match_key long, name string",
    )
    got = sorted(
        (r.probe_key, r.match_key, r.dist) for r in fuzzy_name_pairs(records, probes).collect()
    )
    assert got == [(1, 2, 1), (1, 2, 1), (1, 3, 0)]


def test_fuzzy_name_pairs_fully_identical_rows_keep_both(spark):
    """Two FULLY identical record rows (same match_key AND same name) are
    still two matches under the per-row quadratic oracle (ADVICE r10: the
    r10 fix keyed the candidate dedupe on (probe_key, match_key,
    match_name), which collapsed this case).  The dedupe now keys on a
    pre-banding row id, so only multi-band duplicates of the SAME physical
    row collapse."""
    from duckdb_age_spark.operators.dedup import fuzzy_name_pairs

    base = "ABCDEFGHIJKLMNOPQR"
    probes = spark.createDataFrame([(1, base)], "probe_key long, name string")
    dup = "X" + base[1:]
    records = spark.createDataFrame(
        [(2, dup), (2, dup), (3, base)], "match_key long, name string"
    )
    got = sorted(
        (r.probe_key, r.match_key, r.dist) for r in fuzzy_name_pairs(records, probes).collect()
    )
    assert got == [(1, 2, 1), (1, 2, 1), (1, 3, 0)]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_name_pairs_constant_prefix_brute_force(spark):
    """The round-11 sf10 scale finding's corpus shape, checked for exact
    recall against an in-test quadratic brute force: fixed-format keys
    ('Customer#NNNNN'-style) whose 9-char constant prefix degenerated every
    positional-banding bucket.  The deletion-neighborhood scheme must find
    exactly the brute-force pair set at BOTH d=1 and d=2, with edits planted
    in the constant region, the discriminative region, straddling the
    boundary, and in both shifted-alignment directions (insert and
    delete)."""
    from duckdb_age_spark.operators.dedup import fuzzy_name_pairs

    names = [f"Customer#{k:09d}" for k in range(1, 21)]
    base = names[0]
    names += [
        "Xustomer#" + base[9:],          # sub in the constant region
        base[:17] + "X",                 # sub in the discriminative region
        "CustomerX" + "X" + base[10:],   # double sub straddling the boundary
        base[1:],                        # front deletion (shifted alignment)
        "Q" + base,                      # front insertion (shifted alignment)
        base[:9] + base[10:],            # digit deletion
        base[:13] + "77" + base[15:],    # double sub, trailing digits only
    ]
    rows = [(i + 1, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "k long, name string")
    probes = df.where("k <= 3").selectExpr("k AS probe_key", "name")
    records = df.selectExpr("k AS match_key", "name")
    # d=3 included to pin the generic-d variant generator (the contract
    # queries only exercise d=1/2)
    for d in (1, 2, 3):
        want = {
            (pk, rk): _levenshtein(pn, rn)
            for pk, pn in rows[:3]
            for rk, rn in rows
            if pk != rk and _levenshtein(pn, rn) <= d
        }
        got = {
            (r.probe_key, r.match_key): r.dist
            for r in fuzzy_name_pairs(records, probes, max_dist=d).collect()
        }
        assert got == want, f"d={d}: missing={want.keys() - got.keys()} extra={got.keys() - got.keys() & want.keys()}"


def test_fuzzy_name_pairs_dense_random_corpus_brute_force(spark):
    """Adversarial recall sweep on a SEEDED random corpus over a two-letter
    alphabet with mixed lengths 0..8 — the densest edit-space collisions a
    name corpus can have (every pair is within a few edits, empty and
    near-empty strings included).  Every (probe, record) pair the quadratic
    brute force finds at d=1 and d=2 must come back, with no extras and
    exact distances."""
    import random

    from duckdb_age_spark.operators.dedup import fuzzy_name_pairs

    rng = random.Random(0xA6E)
    names = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 8))) for _ in range(40)]
    rows = [(i + 1, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "k long, name string")
    probes = df.where("k <= 5").selectExpr("k AS probe_key", "name")
    records = df.selectExpr("k AS match_key", "name")
    for d in (1, 2):
        want = {
            (pk, rk): _levenshtein(pn, rn)
            for pk, pn in rows[:5]
            for rk, rn in rows
            if pk != rk and _levenshtein(pn, rn) <= d
        }
        got = {
            (r.probe_key, r.match_key): r.dist
            for r in fuzzy_name_pairs(records, probes, max_dist=d).collect()
        }
        assert got == want, f"d={d}: missing={want.keys() - got.keys()} extra={got.keys() - want.keys()}"


def test_gapfill_hourly_zero_rows_are_real(spark, events):
    from duckdb_age_spark.operators.rollup import gapfill_hourly

    out = gapfill_hourly(events, event_type="signup").collect()
    hours = [r.hour for r in out]
    assert len(hours) == len(set(hours))  # one row per hour, no dups
    n_zero = sum(1 for r in out if r.n_events == 0)
    nonzero = sum(r.n_events for r in out)
    assert nonzero == events.where("event_type = 'signup'").count()
    # spine is contiguous: count matches the hour span between bounds
    import datetime as dt

    lo = dt.datetime.strptime(min(hours), "%Y-%m-%d %H:%M")
    hi = dt.datetime.strptime(max(hours), "%Y-%m-%d %H:%M")
    assert len(hours) == int((hi - lo).total_seconds() // 3600) + 1
    assert n_zero >= 0


def test_connected_components_empty_edges_all_singletons(spark):
    from duckdb_age_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r.id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 2}


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path, events):
    import glob

    from duckdb_age_spark.sources import compact_parquet

    path = str(tmp_path / "frag")
    events.repartition(24).write.parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    n = events.count()
    written = compact_parquet(spark, path, target_file_bytes=1 << 30)
    after = len(glob.glob(path + "/*.parquet"))
    assert before == 24 and written == 1 and after == 1
    assert spark.read.parquet(path).count() == n
    assert not glob.glob(path + "._*")


def test_morton_code_locality(spark):
    """Morton bit-interleave: verify against a direct Python computation and
    the locality property (nearby (x,y) → nearby z)."""
    from duckdb_age_spark.operators.graph import morton_code

    def py_morton(x, y, bits=10):
        z = 0
        for i in range(bits):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in (0, 1, 5, 512, 1023) for y in (0, 3, 700, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_code(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got == {(x, y): py_morton(x, y) for x, y in rows}


def test_pagerank_exact_properties(spark):
    """Rank mass flows to high-in-degree nodes; sum of ranks stays near
    SCALE minus dangling leakage; deterministic across runs."""
    from duckdb_age_spark.operators.graph import SCALE, pagerank_exact

    # star: 1,2,3 all point to 9; plus 9 -> 1 so node 9 is not dangling
    edges = spark.createDataFrame([(1, 9), (2, 9), (3, 9), (9, 1)], "src long, dst long")
    a = {r.node: r.rank for r in pagerank_exact(edges, n_iter=3).collect()}
    b = {r.node: r.rank for r in pagerank_exact(edges, n_iter=3).collect()}
    assert a == b
    assert a[9] == max(a.values()) and a[9] > a[2] == a[3]
    assert 0 < sum(a.values()) <= SCALE


def test_pagerank_checkpoint_every_truncates_lineage(spark):
    """n_iter=20 with checkpoint_every=5: values are bit-identical to the
    unrolled run (fixed-point math is partitioning-independent) and the
    final plan no longer embeds all 20 iterations — lineage is cut at the
    last checkpoint."""
    from duckdb_age_spark.operators.graph import pagerank_exact

    edges = spark.createDataFrame(
        [(i, (i * 7) % 12) for i in range(12)] + [(1, 9), (2, 9)], "src long, dst long"
    )
    plain = pagerank_exact(edges, n_iter=20)
    ckpt = pagerank_exact(edges, n_iter=20, checkpoint_every=5)
    a = {r.node: r.rank for r in plain.collect()}
    b = {r.node: r.rank for r in ckpt.collect()}
    assert a == b
    # after the action, the checkpointed plan is rooted in a materialized RDD
    plan_ckpt = ckpt._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan_ckpt or "LogicalRDD" in plan_ckpt
    # and it is materially smaller than 20 unrolled iterations
    plan_plain = plain._jdf.queryExecution().toString()
    assert len(plan_ckpt) < len(plan_plain) / 2


def test_pii_scrub_counts_and_redacts(spark):
    from duckdb_age_spark.operators.text import pii_scrub

    rows = [
        (1, "mail me at alice.smith+x@sub.example.co or bob@ex.org thanks"),
        (2, "call 555-123-4567 or 555.987.6543 from 10.0.0.1"),
        (3, "server at 192.168.001.042 and 8.8.8.8"),
        (4, "no pii here at all"),
        (5, "mixed: carol@ex.io 555-000-1111 127.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (2, 0, 0)
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips) == (0, 2, 1)
    assert (got[3].n_emails, got[3].n_phones, got[3].n_ips) == (0, 0, 2)
    assert (got[4].n_emails, got[4].n_phones, got[4].n_ips) == (0, 0, 0)
    assert (got[5].n_emails, got[5].n_phones, got[5].n_ips) == (1, 1, 1)
    # unredacted doc keeps its md5; redacted docs change theirs
    import hashlib

    assert got[4].scrubbed_md5 == hashlib.md5(rows[3][1].encode()).hexdigest()
    assert got[5].scrubbed_md5 == hashlib.md5(b"mixed: <EMAIL> <PHONE> <IP>").hexdigest()


def test_repetition_stats_exact(spark):
    from duckdb_age_spark.operators.text import repetition_stats

    rows = [
        (1, "a a a b c"),          # max unigram 3, max bigram 'a a' = 2
        (2, "x y x y x y"),        # max unigram 3, 'x y' = 3, 'y x' = 2
        (3, "unique words only"),  # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert (got[1].n_tokens, got[1].n_distinct, got[1].max_tok_freq, got[1].max_bigram_freq) == (5, 3, 3, 2)
    assert (got[2].n_tokens, got[2].n_distinct, got[2].max_tok_freq, got[2].max_bigram_freq) == (6, 2, 3, 3)
    assert (got[3].n_tokens, got[3].n_distinct, got[3].max_tok_freq, got[3].max_bigram_freq) == (3, 3, 1, 1)


def test_cms_estimate_dominates_exact_and_bounds_error(spark, docs):
    from duckdb_age_spark.operators.stats import cms_heavy_hitters

    out = cms_heavy_hitters(docs, depth=4, width=512, k=10).collect()
    assert len(out) == 10
    n_total = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t")
    ).count()
    for r in out:
        # CMS never underestimates, and the eps*N bound (eps = e/width,
        # conservative form 4/width for the pairwise-independent variant)
        # holds deterministically here because collisions are data-visible.
        assert r.cms_est >= r.exact_n
        assert r.est_ge_exact
        assert r.cms_est <= r.exact_n + (4.0 / 512) * n_total


def test_cms_width_controls_overestimate(spark, docs):
    from duckdb_age_spark.operators.stats import cms_heavy_hitters

    wide = {r.tok: r.cms_est for r in cms_heavy_hitters(docs, width=2048, k=5).collect()}
    narrow = {r.tok: r.cms_est for r in cms_heavy_hitters(docs, width=64, k=5).collect()}
    assert sum(narrow[t] for t in narrow) >= sum(wide[t] for t in wide)


def test_knn_label_vote_planted_clusters(spark):
    from duckdb_age_spark.operators.similarity import knn_label_vote

    # Two well-separated planted clusters: label 0 along +e0, label 1 along
    # +e1; query 0 sits in cluster 0, query 1 in cluster 1.
    def vec(axis, wobble):
        v = [0.0] * 64
        v[axis] = 1.0
        v[8 + wobble] = 0.01 * (wobble + 1)
        return v

    rows = [(0, vec(0, 0), 0), (1, vec(1, 0), 1)]
    rows += [(10 + i, vec(0, i), 0) for i in range(1, 6)]
    rows += [(20 + i, vec(1, i), 1) for i in range(1, 6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.query_id: r for r in knn_label_vote(emb, [0, 1], k=5).collect()}
    assert out[0].predicted_label == 0 and out[0].correct
    assert out[1].predicted_label == 1 and out[1].correct
    assert out[0].votes == 5 and out[1].votes == 5


def test_label_centroid_cosines_orthogonal_and_identical(spark):
    from duckdb_age_spark.operators.similarity import label_centroid_cosines

    def vec(axis, scale=1.0):
        v = [0.0] * 64
        v[axis] = scale
        return v

    # label 0 -> e0, label 1 -> e1 (orthogonal), label 2 -> e0 scaled
    # (cosine 1 with label 0 regardless of magnitude).
    rows = [(i, vec(0), 0) for i in range(3)]
    rows += [(10 + i, vec(1), 1) for i in range(3)]
    rows += [(20 + i, vec(0, 2.5), 2) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r.label_a, r.label_b): r.centroid_cosine for r in label_centroid_cosines(emb).collect()}
    assert out[(0, 1)] == 0.0
    assert out[(1, 2)] == 0.0
    assert abs(out[(0, 2)] - 1.0) < 1e-9


def test_approx_percentile_bound_check_holds(spark, sf_dir):
    from duckdb_age_spark.operators.stats import approx_percentile_check

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = approx_percentile_check(li, accuracy=1000).collect()
    assert len(out) == 4 * li.select("l_returnflag").distinct().count()
    assert all(r.sketch_within_bound for r in out)
    # exact percentiles are monotone in pct within each group
    by_flag: dict = {}
    for r in out:
        by_flag.setdefault(r.l_returnflag, []).append((r.pct, r.exact_pct))
    for vals in by_flag.values():
        ordered = [v for _, v in sorted(vals)]
        assert ordered == sorted(ordered)


def test_lsh_recall_bounds_and_degenerate_exactness(spark, emb):
    from duckdb_age_spark.operators.similarity import lsh_recall_at_k

    out = lsh_recall_at_k(emb, [0, 1, 2], k=5).collect()
    assert len(out) == 3
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in out)
    # with zero hyperplanes every vector lands in bucket 0, so the "ANN"
    # path scans the full corpus and recall must be exactly 1
    degenerate = lsh_recall_at_k(emb, [0, 1, 2], k=5, n_planes=0).collect()
    assert all(r.recall_at_k == 1.0 for r in degenerate)


def test_triangle_stats_no_wedges_yields_zero_ratio(spark):
    from duckdb_age_spark.operators.graph import triangle_stats

    # A perfect matching has no wedges: the ratio must be 0.0, not NaN
    # (0/0 would poison hash comparison and downstream consumers).
    edges = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "src long, dst long")
    row = triangle_stats(edges).collect()[0]
    assert row.n_wedges == 0 and row.n_triangles == 0
    assert row.closed_wedge_ratio == 0.0


def test_triangle_stats_counts_single_triangle(spark):
    from duckdb_age_spark.operators.graph import triangle_stats

    # K3 plus a pendant edge: id-oriented wedges share the LOWER endpoint,
    # so a=1 contributes C(3,2)=3 wedges (2,3),(2,4),(3,4) and a=2 none —
    # 3 wedges, of which (2,3) closes the single triangle.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "src long, dst long"
    )
    row = triangle_stats(edges).collect()[0]
    assert row.n_nodes == 4 and row.n_edges == 4
    assert row.n_triangles == 1
    assert row.n_wedges == 3
    assert row.closed_wedge_ratio == pytest.approx(1 / 3)


def test_asof_forward_picks_earliest_following(spark):
    from duckdb_age_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 25), (3, 2, 5)], "lid long, k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 200), (1, 30, 300), (2, 7, 400)],
        "k long, rts long, val long",
    )
    out = {
        r.lid: (r.val_next, r.rts_next)
        for r in asof_join_forward(
            left, right, "k", "k", "lts", "rts", ["val"]
        ).collect()
    }
    assert out[1] == (100, 10)   # equal ts is inclusive
    assert out[2] == (300, 30)   # earliest FOLLOWING, not latest
    assert out[3] == (400, 7)
    # no later right row → NULLs
    left2 = spark.createDataFrame([(9, 1, 99)], "lid long, k long, lts long")
    r9 = asof_join_forward(left2, right, "k", "k", "lts", "rts", ["val"]).collect()[0]
    assert r9.val_next is None and r9.rts_next is None


def test_weighted_sample_is_deterministic_and_weight_biased(spark, docs):
    from duckdb_age_spark.operators.pipeline import weighted_sample

    a = [(r.doc_id, r.weight, r.rk) for r in weighted_sample(docs, k=30).orderBy("rk").collect()]
    b = [(r.doc_id, r.weight, r.rk) for r in weighted_sample(docs, k=30).orderBy("rk").collect()]
    assert a == b and len(a) == 30
    assert [r[2] for r in a] == list(range(1, 31))
    # weight bias: the sampled docs' mean weight should exceed the corpus mean
    sampled_mean = sum(r[1] for r in a) / len(a)
    corpus_mean = (
        docs.selectExpr("avg(greatest(size(split(trim(text), '\\\\s+')), 1)) AS m").first().m
    )
    assert sampled_mean > corpus_mean


def test_quantile_binning_partitions_all_rows_contiguously(spark, sf_dir):
    from duckdb_age_spark.operators.stats import quantile_binning

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bins = quantile_binning(orders, n_bins=10).orderBy("bin").collect()
    assert [r.bin for r in bins] == list(range(1, 11))
    assert sum(r.n_orders for r in bins) == orders.count()
    # equal-frequency: bin sizes differ by at most 1; ranges are ordered
    sizes = [r.n_orders for r in bins]
    assert max(sizes) - min(sizes) <= 1
    for prev, cur in zip(bins, bins[1:]):
        assert prev.hi <= cur.lo


def test_quantile_binning_ties_straddling_boundary(spark):
    # sorted cents [100, 200, 200, 300] into 2 bins of 2: the two tied
    # 200s straddle the boundary; whichever tie-order ntile would pick,
    # the bin MULTISETS are {1.00, 2.00} and {2.00, 3.00} — the r15
    # histogram form must reproduce exactly that
    from duckdb_age_spark.operators.stats import quantile_binning

    df = spark.createDataFrame(
        [(1, 1.00), (2, 2.00), (3, 2.00), (4, 3.00)],
        "o_orderkey long, o_totalprice double",
    )
    bins = quantile_binning(df, n_bins=2).orderBy("bin").collect()
    assert [(r.bin, r.n_orders, r.lo, r.hi, r.mean_price) for r in bins] == [
        (1, 2, 1.00, 2.00, 1.5),
        (2, 2, 2.00, 3.00, 2.5),
    ]
    # remainder rule: 5 rows into 3 bins -> first 5 mod 3 = 2 bins get the
    # extra row (sizes 2,2,1), all values tied
    df5 = spark.createDataFrame(
        [(i, 7.00) for i in range(5)], "o_orderkey long, o_totalprice double"
    )
    bins5 = quantile_binning(df5, n_bins=3).orderBy("bin").collect()
    assert [(r.bin, r.n_orders) for r in bins5] == [(1, 2), (2, 2), (3, 1)]
    assert all(r.lo == 7.00 and r.hi == 7.00 and r.mean_price == 7.0 for r in bins5)


def test_kcore_peels_pendant_chain(spark):
    from duckdb_age_spark.operators.graph import kcore_peel

    # triangle (1,2,3) with a pendant chain 3-4-5: 2-core = the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r.node: r.degree for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_order_concurrency_counts_overlaps(spark):
    from duckdb_age_spark.operators.rollup import order_concurrency
    import datetime as dt

    d = dt.date
    orders = spark.createDataFrame(
        [(1, d(1995, 1, 1)), (2, d(1995, 1, 3)), (3, d(1995, 2, 10))],
        "o_orderkey long, o_orderdate date",
    )
    lineitem = spark.createDataFrame(
        [(1, d(1995, 1, 5)), (2, d(1995, 1, 4)), (3, d(1995, 2, 1))],  # order 3 ships BEFORE orderdate
        "l_orderkey long, l_shipdate date",
    )
    out = {r.month: (r.peak_open_orders, r.avg_open_orders) for r in
           order_concurrency(orders, lineitem).collect()}
    # Jan: order1 open 1-5 (5 days), order2 open 3-4 (2 days) → peak 2 on days 3,4
    assert out["1995-01"][0] == 2
    # Feb: order3's negative span clamps to its order day → one open day
    assert out["1995-02"] == (1, 1.0)


def test_embedding_zscore_digest_stable_and_shaped(spark, emb):
    from duckdb_age_spark.operators.similarity import embedding_zscore_digest

    a = {r.vec_id: (r.n_dims, r.z_digest) for r in embedding_zscore_digest(emb).collect()}
    b = {r.vec_id: (r.n_dims, r.z_digest) for r in embedding_zscore_digest(emb).collect()}
    assert a == b and len(a) == emb.count()
    dims = {v[0] for v in a.values()}
    assert len(dims) == 1  # uniform dimensionality
    # digests differ across vectors (no degenerate constant output)
    assert len({v[1] for v in a.values()}) > len(a) // 2


def test_gopher_screen_rules_fire_on_planted_docs(spark):
    from duckdb_age_spark.operators.text import gopher_quality_screen

    good = (
        "the quick brown fox and the lazy dog is one of those classic test "
        "sentences that people like to repeat in examples with many plain "
        "words so that it easily clears the fifty word floor used in the "
        "gopher rules and also contains enough common stopwords to pass the "
        "stopword floor while keeping word lengths in the typical range"
    )
    short = "tiny doc"                       # fails word_count (and stopwords)
    symbols = "# " * 60                      # fails symbol_ratio + mean_word_len
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r.rule: r for r in gopher_quality_screen(df).collect()}
    assert set(out) == {"word_count", "mean_word_len", "symbol_ratio", "stopword_floor"}
    assert out["word_count"].n_docs == 3
    assert out["word_count"].n_fail == 1      # only the 2-word doc is short
    assert out["symbol_ratio"].n_fail >= 1    # the '#'-only doc
    assert out["mean_word_len"].n_fail >= 1   # 1-char '#' words
    assert out["word_count"].n_pass_all == 1  # only the good doc passes all


def test_ks_identical_distributions_is_zero(spark):
    from duckdb_age_spark.operators.stats import ks_two_sample

    # pairs (2k, 2k+1) share a value, one lands in each group → identical
    # per-group value multisets
    rows = [(i, "1-URGENT" if i % 2 == 0 else "3-MEDIUM", float((i // 2) % 10) + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderpriority string, o_totalprice double")
    r = ks_two_sample(df).collect()[0]
    assert r.n_a == 50 and r.n_b == 50
    assert r.d_stat == 0.0  # identical per-group value multisets → D = 0


def test_gini_extremes(spark):
    from duckdb_age_spark.operators.stats import gini_coefficient

    # perfectly equal revenue → G = 0
    eq = spark.createDataFrame(
        [(i, "x", 100.0) for i in range(10)],
        "o_custkey long, o_orderpriority string, o_totalprice double",
    )
    assert gini_coefficient(eq).collect()[0].gini == 0.0
    # one customer holds everything → G → (n-1)/n
    skew = spark.createDataFrame(
        [(0, "x", 1000.0)] + [(i, "x", 0.01) for i in range(1, 10)],
        "o_custkey long, o_orderpriority string, o_totalprice double",
    )
    g = gini_coefficient(skew).collect()[0].gini
    assert 0.85 < g < 0.9


def test_label_propagation_separates_cliques(spark):
    from duckdb_age_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA must label each clique
    # by its own minimum node, bridge notwithstanding
    def clique(nodes):
        return [(a, b) for a in nodes for b in nodes if a < b]

    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
        "src long, dst long",
    )
    out = {r.node: r.label for r in label_propagation(edges, rounds=3).collect()}
    assert {out[n] for n in (1, 2, 3)} == {1}
    assert {out[n] for n in (11, 12, 13)} == {10}


def test_hashing_vectorizer_digest_deterministic(spark, docs):
    from duckdb_age_spark.operators.text import hashing_vectorizer_digest

    sub = docs.limit(50)
    a = {r.doc_id: (r.n_tokens, r.nnz, r.vec_digest) for r in hashing_vectorizer_digest(sub).collect()}
    b = {r.doc_id: (r.n_tokens, r.nnz, r.vec_digest) for r in hashing_vectorizer_digest(sub).collect()}
    assert a == b and len(a) == 50
    for n_tokens, nnz, _ in a.values():
        assert 1 <= nnz <= min(64, n_tokens)


def test_ohlc_candles_deterministic_open_close(spark):
    from duckdb_age_spark.operators.events import ohlc_candles
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # two events at the SAME timestamp: lower event_id wins open
        (1, base, 1, "m", 5.0, "{}"),
        (2, base, 1, "m", 9.0, "{}"),
        (3, base + dt.timedelta(minutes=30), 1, "m", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=59), 1, "m", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = ohlc_candles(df, bucket_sec=3600).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.n_events) == (5.0, 9.0, 1.0, 7.0, 4)


def test_heartbeat_uptime_gaps(spark):
    from duckdb_age_spark.operators.events import heartbeat_uptime
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: pings at 0h, 1h, 5h — first gap (1h) is up, second (4h) is down
        (1, base, 1, "p", 0.0, "{}"),
        (2, base + dt.timedelta(hours=1), 1, "p", 0.0, "{}"),
        (3, base + dt.timedelta(hours=5), 1, "p", 0.0, "{}"),
        # user 2: a single ping → uptime 1.0 by convention
        (4, base, 2, "p", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r.user_id: r for r in heartbeat_uptime(df, gap_sec=7200).collect()}
    assert out[1].span_us == 5 * 3600 * 1_000_000
    assert out[1].up_us == 3600 * 1_000_000
    assert out[1].uptime == 0.2
    assert out[2].uptime == 1.0 and out[2].span_us == 0


def test_topk_similar_symmetry_and_rank(spark):
    from duckdb_age_spark.operators.graph import topk_similar_customers

    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 5), (2, 3, 7), (1, 4, 5)],
        "src long, dst long, shared_parts long",
    )
    out = {(r.cust, r.rk): (r.similar_cust, r.shared_parts) for r in
           topk_similar_customers(edges, k=2).collect()}
    assert out[(1, 1)] == (2, 10)
    assert out[(1, 2)] == (3, 5)      # ties (3,5) vs (4,5) → min id first
    assert out[(2, 1)] == (1, 10)     # symmetrized: 2 sees 1
    assert out[(4, 1)] == (1, 5)


def test_time_to_convert_known_latencies(spark):
    from duckdb_age_spark.operators.events import time_to_convert
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def ev(eid, uid, kind, minutes):
        return (eid, base + dt.timedelta(minutes=minutes), uid, kind, 0.0, "{}")

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 10),    # 600s
        ev(3, 2, "view", 0), ev(4, 2, "purchase", 30),    # 1800s
        ev(5, 3, "view", 0), ev(6, 3, "purchase", 60),    # 3600s
        ev(7, 4, "purchase", 0), ev(8, 4, "view", 10),    # purchase BEFORE view: excluded
        ev(9, 5, "view", 0),                              # never converts: excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = time_to_convert(df).collect()[0]
    assert r.n_converted == 3
    assert r.median_sec == 1800       # rank floor(0.5*2)+1 = 2
    assert r.p90_sec == 1800          # rank floor(0.9*2)+1 = 2
    assert r.avg_sec == 2000.0


def test_daily_autocorr_perfect_trend(spark):
    from duckdb_age_spark.operators.rollup import daily_autocorr
    import datetime as dt

    # strictly increasing daily counts over consecutive days → r = 1
    rows = []
    eid = 0
    for d in range(6):
        for _ in range(d + 1):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 12), 1, "x", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = daily_autocorr(df).collect()[0]
    assert r.n_days == 6 and r.n_pairs == 5
    assert r.autocorr == 1.0


def test_pack_efficiency_sorted_never_worse(spark, docs):
    from duckdb_age_spark.operators.pipeline import pack_efficiency_report

    out = pack_efficiency_report(docs, budget_tokens=2048).collect()
    assert out
    for r in out:
        # length-descending layout can only tighten bins, never loosen them
        assert r.bins_sorted <= r.bins_arrival
        assert 0 < r.eff_arrival <= 1.0001 and 0 < r.eff_sorted <= 1.0001
        assert r.eff_sorted >= r.eff_arrival


def test_degree_distribution_bins(spark):
    from duckdb_age_spark.operators.graph import degree_distribution

    # star: hub degree 8 (bin 3), leaves degree 1 (bin 0)
    edges = spark.createDataFrame([(0, i) for i in range(1, 9)], "src long, dst long")
    out = {r.degree_bin: (r.lo_degree, r.n_nodes) for r in degree_distribution(edges).collect()}
    assert out[0] == (1, 8)
    assert out[3] == (8, 1)


def test_welch_t_symmetric_groups(spark):
    from duckdb_age_spark.operators.stats import welch_ttest

    # identical distributions in both groups → t == 0
    rows = [(i, "1-URGENT" if i % 2 == 0 else "2-HIGH", float((i // 2) % 10) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderpriority string, o_totalprice double")
    r = welch_ttest(df).collect()[0]
    assert r.n_a == 100 and r.n_b == 100
    assert r.t_stat == 0.0
    assert r.mean_a == r.mean_b


def test_pareto_share_uniform_and_skewed(spark):
    from duckdb_age_spark.operators.events import pareto_share
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # uniform: 20 users × 5 events → top 10% (2 users) hold exactly 10%
    rows = [(u * 100 + i, base, u, "x", 0.0, "{}") for u in range(20) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = pareto_share(df, pct=10).collect()[0]
    assert (r.n_users, r.top_k, r.total_events) == (20, 2, 100)
    assert r.share == 0.1
    # skewed: user 0 makes 91 of 110 events → top-2 share >= 91/110
    rows2 = [(i, base, 0, "x", 0.0, "{}") for i in range(91)]
    rows2 += [(1000 + u, base, u, "x", 0.0, "{}") for u in range(1, 20)]
    df2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r2 = pareto_share(df2, pct=10).collect()[0]
    assert r2.share > 0.8


def test_transition_matrix_row_shares_sum_to_one(spark, sf_dir):
    from duckdb_age_spark.operators.relational import priority_transition_matrix
    from collections import defaultdict

    out = priority_transition_matrix(spark.read.parquet(f"{sf_dir}/orders.parquet")).collect()
    assert out
    rows = defaultdict(float)
    for r in out:
        rows[r.prev_priority] += r.row_share
    for prev, s in rows.items():
        assert abs(s - 1.0) < 1e-3, (prev, s)


def test_assortativity_extremes(spark):
    from duckdb_age_spark.operators.graph import degree_assortativity

    # perfect matching: every endpoint degree 1 → zero variance → 0.0 guard
    matching = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "src long, dst long")
    assert degree_assortativity(matching).collect()[0].assortativity == 0.0
    # star: hub deg n, leaves deg 1 — perfectly disassortative → r = -1
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    r = degree_assortativity(star).collect()[0]
    assert r.n_edges == 5
    assert r.assortativity == -1.0


def test_langid_confusion_cells_cover_corpus(spark, docs):
    from duckdb_age_spark.operators.text import langid_confusion

    out = langid_confusion(docs).collect()
    assert sum(r.n_docs for r in out) == docs.count()
    # shares within each true class sum to 1
    from collections import defaultdict
    per_class = defaultdict(float)
    for r in out:
        per_class[r.lang] += r.class_share
    for lang, s in per_class.items():
        assert abs(s - 1.0) < 1e-3, (lang, s)


def test_sentence_stats_segments(spark):
    from duckdb_age_spark.operators.text import sentence_stats

    df = spark.createDataFrame(
        [
            (1, "One two. Three four five! Six?"),
            (2, "no terminal punctuation here"),
            (3, "!!!"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in sentence_stats(df).collect()}
    assert out[1].n_sentences == 3
    assert out[1].max_sentence_chars == len("Three four five")
    assert out[2].n_sentences == 1
    assert out[3].n_sentences == 0 and out[3].mean_sentence_chars == 0.0


def test_revenue_share_sums_to_one(spark, sf_dir):
    from duckdb_age_spark.operators.relational import revenue_share_by_nation

    out = revenue_share_by_nation(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
    ).collect()
    assert out
    assert abs(sum(r.share for r in out) - 1.0) < 1e-3
    assert all(0 < r.share < 1 for r in out)


def test_psi_identical_halves_is_zero(spark):
    from duckdb_age_spark.operators.stats import psi_drift
    import datetime as dt

    # same value multiset in both halves → every bin's p == q → PSI = 0
    rows = []
    for i in range(200):
        half = dt.date(1995, 1, 1) if i % 2 == 0 else dt.date(1996, 1, 1)
        rows.append((i, half, float((i // 2) % 50) * 100 + 10))
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date, o_totalprice double")
    r = psi_drift(df, split_date="1995-06-01").collect()[0]
    assert r.n_ref == 100 and r.n_cur == 100
    assert r.psi == 0.0
    assert r.n_bins_skipped == 0


def test_psi_detects_shift(spark):
    from duckdb_age_spark.operators.stats import psi_drift
    import datetime as dt

    rows = [(i, dt.date(1995, 1, 1), float(i % 50) + 1) for i in range(200)]
    rows += [(1000 + i, dt.date(1996, 1, 1), float(i % 50) + 500) for i in range(200)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date, o_totalprice double")
    r = psi_drift(df, split_date="1995-06-01").collect()[0]
    # completely disjoint distributions: every bin one-sided except the top
    assert r.n_bins_skipped >= 8


def test_psi_null_dates_excluded_from_both_sides(spark):
    """ADVICE r15: the fused count(*)−sum(r) histogram silently binned
    null-date rows as CURRENT (the pre-fusion where-filters excluded them
    from both sides).  Null-date rows must not move the result at all."""
    from duckdb_age_spark.operators.stats import psi_drift
    import datetime as dt

    rows = []
    for i in range(200):
        half = dt.date(1995, 1, 1) if i % 2 == 0 else dt.date(1996, 1, 1)
        rows.append((i, half, float((i // 2) % 50) * 100 + 10))
    clean = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(9000 + i, None, 999999.0) for i in range(25)],
            "o_orderkey long, o_orderdate date, o_totalprice double",
        )
    )
    a = psi_drift(clean, split_date="1995-06-01").collect()[0]
    b = psi_drift(noisy, split_date="1995-06-01").collect()[0]
    assert (a.n_ref, a.n_cur, a.psi) == (b.n_ref, b.n_cur, b.psi)
    assert b.n_cur == 100  # the 25 null-date rows joined NEITHER side


def test_stickiness_bounds(spark, sf_dir):
    from duckdb_age_spark.operators.events import user_stickiness
    from duckdb_age_spark.sources import read_table

    out = user_stickiness(read_table(spark, sf_dir, "events")).collect()
    assert out
    for r in out:
        # avg DAU can never exceed MAU; stickiness is a (0, 1] ratio
        assert 0 < r.stickiness <= 1.0
        assert r.avg_dau <= r.mau


def test_bloom_prefilter_no_false_negatives(spark):
    from duckdb_age_spark.operators.skew import bloom_prefilter_stats

    customer = spark.createDataFrame(
        [(i, "BUILDING" if i % 3 == 0 else "MACHINERY") for i in range(300)],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(i, i % 300, 1.0) for i in range(3000)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    r = bloom_prefilter_stats(orders, customer, m_bits=512, k_hashes=3).collect()[0]
    # Bloom filters NEVER miss: every true match must pass
    assert r.n_true_match == sum(1 for i in range(3000) if (i % 300) % 3 == 0)
    assert r.n_pass_bloom >= r.n_true_match
    assert r.n_false_pos == r.n_pass_bloom - r.n_true_match
    # 512 bits for 100 keys is deliberately saturated — FPs must occur
    assert r.n_false_pos > 0


def test_incremental_agg_merge_equals_full_recompute(spark, sf_dir):
    from duckdb_age_spark.sources.upsert import incremental_agg_merge
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    merged = {r.custkey: (r.n_orders, r.total_cents)
              for r in incremental_agg_merge(orders).collect()}
    full = {r.custkey: (r.n_orders, r.total_cents) for r in
            orders.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast("bigint").alias("total_cents"))
            .collect()}
    assert merged == full


def test_triangle_degree_orientation_bounds_skewed_star(spark):
    """Planted worst case for id-orientation: a 200-leaf star whose hub has
    the LOWEST id.  Id-oriented, the hub anchors C(200,2)=19900 wedges;
    degree-oriented, every edge points leaf→hub (leaves have degree 1-3),
    so the hub anchors none and the wedge count collapses to the few
    leaf-local ones.  Triangle count must be identical under both
    orientations (it is orientation-invariant)."""
    from duckdb_age_spark.operators.graph import triangle_stats

    hub = 0
    star = [(hub, leaf) for leaf in range(1, 201)]
    # 3-cycle among leaves 1,2,3: with the hub edges this plants exactly 4
    # triangles — {0,1,2}, {0,2,3}, {0,1,3}, {1,2,3}.
    extra = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(star + extra, "src long, dst long")
    by_id = triangle_stats(edges, orientation="id").collect()[0]
    by_deg = triangle_stats(edges, orientation="degree").collect()[0]
    # invariants
    assert by_id.n_triangles == by_deg.n_triangles == 4  # 3 hub tris + leaf K3
    assert by_id.n_nodes == by_deg.n_nodes == 201
    assert by_id.n_edges == by_deg.n_edges == 203
    # the point: id-oriented wedge count exploded, degree-oriented is bounded
    assert by_id.n_wedges >= 200 * 199 // 2
    assert by_deg.n_wedges <= 20, f"degree orientation failed to bound wedges: {by_deg.n_wedges}"


def test_triangle_degree_orientation_rejects_bad_flag(spark):
    from duckdb_age_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        triangle_stats(edges, orientation="random")


def test_linreg_exact_constant_x_yields_nulls(spark):
    from duckdb_age_spark.operators.stats import linreg_exact

    df = spark.createDataFrame(
        [("a", 5, 10), ("a", 5, 20), ("b", 1, 1), ("b", 2, 3)],
        "g string, x long, y long",
    )
    out = {r.g: r for r in linreg_exact(df, "g", F.col("x"), F.col("y")).collect()}
    # constant x in group a: degenerate normal equation -> NULLs, never NaN
    assert out["a"].slope is None and out["a"].intercept is None
    # group b: y = 2x - 1 exactly
    assert out["b"].slope == 2.0 and out["b"].intercept == -1.0


def test_scd2_epoch_is_timezone_independent(spark):
    from duckdb_age_spark.operators.relational import scd2_priority_history

    # TIMESTAMP_NTZ input — what the parquet fixtures read as; for an
    # instant TimestampType the calendar day is inherently session-TZ-
    # defined, so NTZ is the type the TZ-free claim is made for
    orders = spark.createDataFrame(
        [
            (10, 1, "1-URGENT", "1995-03-05 00:00:00"),
            (10, 2, "1-URGENT", "1995-04-01 00:00:00"),  # dup priority collapses
            (10, 3, "3-MEDIUM", "1995-06-10 00:00:00"),
        ],
        "o_custkey long, o_orderkey long, o_orderpriority string, d string",
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.to_timestamp("d").cast("timestamp_ntz").alias("o_orderdate"),
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        # both offset signs: a positive-only zone would mask a day-flip
        # (midnight UTC minus any negative offset lands on the previous day)
        for tz in ("UTC", "Asia/Tokyo", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            rows = scd2_priority_history(orders, sample_mod=1).orderBy("version").collect()
            results[tz] = [(r.version, r.priority, r.eff_from, r.eff_to, r.is_current) for r in rows]
        assert results["UTC"] == results["Asia/Tokyo"] == results["America/New_York"]
        assert len(results["UTC"]) == 2  # consecutive duplicate collapsed
        assert results["UTC"][0][2] == 794361600  # 1995-03-05 * 86400
        assert results["UTC"][1][4] is True  # open row
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_int8_topk_rounds_cosine_to_4dp(spark, emb):
    from duckdb_age_spark.operators.similarity import int8_topk

    out = int8_topk(emb, [0, 1], k=3).collect()
    assert len(out) == 6
    for r in out:
        assert abs(r.cosine_q8 - round(r.cosine_q8, 4)) < 1e-12
        assert -1.0001 <= r.cosine_q8 <= 1.0001


def test_bfs_hops_path_graph_and_bound(spark):
    from duckdb_age_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5 plus isolated edge (8,9): hops exact, unreachable
    # nodes absent, max_hops bound respected
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    out = {r.node: r.hops for r in bfs_hops(edges, 1, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops away; 8/9 unreachable


def test_bfs_hops_takes_shortest_route(spark):
    from duckdb_age_spark.operators.graph import bfs_hops

    # triangle + tail: node 3 reachable in 1 hop directly and 2 hops via 2 —
    # BFS must record 1 (first-reached wins, later frontier anti-joined out)
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    out = {r.node: r.hops for r in bfs_hops(edges, 1, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_chi_square_independent_table_is_zero(spark):
    from duckdb_age_spark.operators.stats import chi_square_independence

    # perfectly independent 2x2 design (every combination equally frequent):
    # expected == observed, all contributions 0, chi2 == 0
    rows = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square_independence(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r.observed == 10 and r.expected == 10.0 for r in out)
    assert all(r.contribution == 0.0 and r.chi2 == 0.0 for r in out)


def test_chi_square_dependent_table_positive(spark):
    from duckdb_age_spark.operators.stats import chi_square_independence

    # perfect association: a==x always pairs with u, y with v
    rows = [("x", "u")] * 10 + [("y", "v")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square_independence(df, "a", "b").collect()
    assert all(r.chi2 == 20.0 for r in out)  # chi2 == n for a perfect 2x2


def test_benford_shares_and_bounds(spark, sf_dir):
    from duckdb_age_spark.operators.stats import benford_check

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = benford_check(orders).collect()
    assert {r.digit for r in out} <= set(range(1, 10))
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    for r in out:
        assert 0.0 <= r.benford_share <= 0.3011  # log10(2) rounded up
        assert r.abs_dev >= 0.0


def test_edge_jaccard_known_graph(spark):
    from duckdb_age_spark.operators.graph import edge_jaccard_similarity

    # K3 + pendant: edge (1,2) has common neighbor {3}, N(1)={2,3,4},
    # N(2)={1,3} -> union {1,2,3,4} = 4, jaccard 1/4; pendant edge (1,4)
    # shares nothing -> 0
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (1, 4)], "src long, dst long")
    out = {(r.src, r.dst): r for r in edge_jaccard_similarity(edges).collect()}
    assert out[(1, 2)].common_neighbors == 1 and out[(1, 2)].jaccard == 0.25
    assert out[(1, 3)].common_neighbors == 1 and out[(1, 3)].jaccard == 0.25
    assert out[(2, 3)].common_neighbors == 1  # N(2)={1,3}, N(3)={1,2}: common {1}
    assert out[(2, 3)].jaccard == pytest.approx(1 / 3)
    assert out[(1, 4)].common_neighbors == 0 and out[(1, 4)].jaccard == 0.0


def test_mad_outliers_flags_planted_extreme(spark):
    from duckdb_age_spark.operators.stats import mad_outliers

    # 9 prices clustered at ~$10 +/- small devs, one wild $10k row:
    # median 10.00, mad small, exactly one point beyond 3*mad
    prices = [9.97, 9.98, 9.99, 10.00, 10.00, 10.01, 10.02, 10.03, 10000.00]
    df = spark.createDataFrame(
        [("A", p) for p in prices], "l_returnflag string, l_extendedprice double"
    )
    row = mad_outliers(df, k=3).collect()[0]
    assert row.n_rows == 9
    assert row.median == 10.00
    assert row.mad == 0.02  # devs sorted: 0,0,.01,.01,.02,.02,.03,.03,9990 -> rank5=.02
    assert row.n_outliers == 1


def test_mad_outliers_even_group_uses_lower_middle(spark):
    from duckdb_age_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("A", 1.00), ("A", 2.00), ("A", 3.00), ("A", 4.00)],
        "l_returnflag string, l_extendedprice double",
    )
    row = mad_outliers(df, k=3).collect()[0]
    assert row.median == 2.00  # rank floor((4+1)/2)=2 -> lower middle


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    from duckdb_age_spark.operators.text import tfidf_keywords

    # 'zebra' appears only in doc 0 and must outrank 'common' (in all docs,
    # idf ln(4/4)=0 -> tfidf 0); within-doc ties break by token asc
    docs = spark.createDataFrame(
        [
            (0, "common zebra zebra"),
            (1, "common alpha"),
            (2, "common beta"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.tok, r.tf, r.df, r.tfidf))
    top0 = sorted(by_doc[0])[0]
    assert top0[1] == "zebra" and top0[2] == 2 and top0[3] == 1
    assert top0[4] > 0
    # 'common' has df == n_docs -> idf = ln(4/4) = 0 -> score exactly 0
    common = [x for x in by_doc[1] if x[1] == "common"] + [x for x in by_doc[2] if x[1] == "common"]
    assert all(x[4] == 0.0 for x in common)


def test_tfidf_keywords_respects_k(spark, docs):
    from duckdb_age_spark.operators.text import tfidf_keywords

    out = tfidf_keywords(docs, k=3)
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 3


def test_mixture_sample_quotas_and_determinism(spark, docs):
    from duckdb_age_spark.operators.pipeline import mixture_sample

    quotas = {"src0": 5, "src1": 2}
    out = mixture_sample(docs, quotas).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert set(by_src) == {"src0", "src1"}  # unlisted sources excluded
    assert len(by_src["src0"]) == 5 and len(by_src["src1"]) == 2
    # deterministic: same pick on a second run
    again = mixture_sample(docs, quotas).collect()
    assert {(r.source, r.doc_id) for r in again} == {(r.source, r.doc_id) for r in out}


def test_mixture_sample_quota_larger_than_stratum(spark):
    from duckdb_age_spark.operators.pipeline import mixture_sample

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    out = mixture_sample(docs, {"a": 10, "b": 1})
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 2, "b": 1}  # capped at availability


def test_bfs_hops_empty_graph_returns_empty(spark):
    from duckdb_age_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([], "src long, dst long")
    out = bfs_hops(edges, max_hops=3)  # default source on an empty graph
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "hops"]


def test_int8_quantize_zero_vector_yields_zero_codes(spark):
    from duckdb_age_spark.operators.similarity import int8_quantize

    emb = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] + [0.0] * 63)], "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: r for r in int8_quantize(emb).collect()}
    # all-zero vector: zero codes and zero norm, never NaN/null
    assert out[0].qv == [0] * 64 and out[0].qnorm2 == 0
    assert out[1].qv[0] == 127 and out[1].qnorm2 == 127 * 127


def test_morton_code_is_bijective_in_range(spark):
    from duckdb_age_spark.operators.graph import morton_code

    # exhaustive over bits=5: 1024 (x, y) pairs must map to 1024 distinct
    # codes inside [0, 2^10) — the property file-skipping relies on
    df = (
        spark.range(32).withColumnRenamed("id", "x")
        .crossJoin(spark.range(32).withColumnRenamed("id", "y"))
        .select(morton_code(F.col("x"), F.col("y"), bits=5).alias("z"))
    )
    stats = df.agg(
        F.countDistinct("z").alias("d"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).collect()[0]
    assert stats.d == 1024 and stats.lo == 0 and stats.hi == 1023


def test_cohort_retention_offsets_and_cohort_sizes(spark):
    from duckdb_age_spark.operators.relational import cohort_retention

    # cust 1 orders in Jan+Mar 2020 (offsets 0, 2); cust 2 only Jan (offset 0)
    orders = spark.createDataFrame(
        [
            (1, "2020-01-15"), (1, "2020-01-20"), (1, "2020-03-02"),
            (2, "2020-01-05"),
        ],
        "o_custkey long, d string",
    ).select("o_custkey", F.to_timestamp("d").alias("o_orderdate"))
    out = {(r.cohort_ym, r.offset_months): r.n_customers for r in cohort_retention(orders).collect()}
    jan2020 = 2020 * 12 + 0
    assert out == {(jan2020, 0): 2, (jan2020, 2): 1}


def test_categorical_entropy_known_values(spark):
    from duckdb_age_spark.operators.stats import categorical_entropy

    import math

    # uniform over 4 categories -> ln 4; constant column -> 0
    uniform = spark.createDataFrame([(c,) for c in "abcd" for _ in range(5)], "x string")
    row = categorical_entropy(uniform, "x").collect()[0]
    assert row.n_rows == 20 and row.n_categories == 4
    assert abs(row.entropy - math.log(4)) < 1e-6
    const = spark.createDataFrame([("k",)] * 7, "x string")
    row2 = categorical_entropy(const, "x").collect()[0]
    assert row2.n_categories == 1 and row2.entropy == 0.0


def test_weighted_pagerank_favors_heavy_edges(spark):
    from duckdb_age_spark.operators.graph import SCALE, weighted_pagerank

    # star: hub 1 sends to 2 with weight 9 and to 3 with weight 1;
    # 2 and 3 send everything back to 1.  After any iteration rank(2) must
    # exceed rank(3) by ~9x of the damped hub mass; total mass conserved
    # up to integer-division dust.
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (2, 1, 1), (3, 1, 1)], "src long, dst long, w long"
    )
    out = {r.node: r.rank for r in weighted_pagerank(edges, n_iter=2).collect()}
    assert out[2] > out[3]
    assert sum(out.values()) <= SCALE
    assert sum(out.values()) > SCALE * 95 // 100  # only rounding dust lost


def test_weighted_pagerank_uniform_weights_match_unweighted(spark):
    from duckdb_age_spark.operators.graph import pagerank_exact, weighted_pagerank

    # with all weights equal, (rank*w) DIV (deg*w) == rank DIV deg exactly
    # when w divides evenly — use w=1 so the kernels are arithmetic-identical
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    ew = spark.createDataFrame([(a, b, 1) for a, b in pairs], "src long, dst long, w long")
    a = {r.node: r.rank for r in pagerank_exact(e, n_iter=3).collect()}
    b = {r.node: r.rank for r in weighted_pagerank(ew, n_iter=3).collect()}
    assert a == b


def test_weighted_pagerank_empty_graph_returns_empty(spark):
    from duckdb_age_spark.operators.graph import weighted_pagerank

    edges = spark.createDataFrame([], "src long, dst long, w long")
    out = weighted_pagerank(edges)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank"]


def test_bigram_logprob_order_sensitivity(spark):
    from duckdb_age_spark.operators.pipeline import bigram_logprob

    # cb: ab=3, ba=3, ac=1 -> cf(a)=4, cf(b)=3; so p(b|a)=3/4, p(a|b)=1,
    # p(c|a)=1/4.  Docs dominated by the rare a->c transition must score
    # lowest; more common-transition content scores higher.
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),   # mean = 2*ln(3/4)/3
            (2, "b a b a"),   # mean = ln(3/4)/3
            (3, "a c"),       # mean = ln(1/4)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.mean_bigram_logprob for r in bigram_logprob(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3] < out[1] < out[2]
    import math
    assert abs(out[3] - round(math.log(0.25), 3)) < 1e-9
    # sanity: probabilities are <= 1 so mean log-probs are <= 0
    assert all(v <= 0 for v in out.values())


def test_bigram_logprob_excludes_single_token_docs(spark):
    from duckdb_age_spark.operators.pipeline import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "only"), (2, "two words")], "doc_id long, text string"
    )
    out = {r.doc_id: r.mean_bigram_logprob for r in bigram_logprob(docs).collect()}
    assert set(out) == {2}
    assert out[2] == 0.0  # "two words" is the only bigram starting with "two": p=1


def test_time_weighted_avg_known_intervals(spark):
    from duckdb_age_spark.operators.rollup import time_weighted_avg

    # type A at t=0s v=10 (holds 10s), t=10s v=20 (holds 30s), t=40s (no
    # successor, excluded): TWAP = (10*10 + 20*30) / 40 = 17.5
    rows = [
        (1, "A", 0, 10.0),
        (2, "A", 10, 20.0),
        (3, "A", 40, 99.0),  # terminal observation: excluded
    ]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, sec long, value double"
    ).select(
        "event_id", "event_type", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    out = time_weighted_avg(events, bucket_sec=3600).collect()
    assert len(out) == 1
    r = out[0]
    assert r.event_type == "A" and r.n_intervals == 2
    assert r.bucket_us == 0
    assert abs(r.twap - 17.5) < 1e-9


def test_time_weighted_avg_burst_insensitive(spark):
    from duckdb_age_spark.operators.rollup import time_weighted_avg

    # a burst of 100 rapid v=0 events within 1s followed by v=10 held 100s:
    # plain avg is ~0.1, TWAP must be dominated by the long-held value
    rows = [(i, "B", i * 0.01, 0.0) for i in range(100)]
    rows += [(100, "B", 1.0, 10.0), (101, "B", 101.0, 0.0)]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, sec double, value double"
    ).select(
        "event_id", "event_type", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    r = time_weighted_avg(events, bucket_sec=3600).collect()[0]
    assert r.twap > 9.0  # 10 held for 100 of 101 seconds


def test_iterative_ops_reliable_checkpoint_mode(spark, reliable_ckpt_dir):
    """VERDICT r5 item 7: connected_components and bfs_hops accept a
    reliable checkpoint_dir (cluster mode, survives executor loss) and
    produce identical results to the localCheckpoint default.  Uses the
    session-shared reliable_ckpt_dir: the SparkContext keeps ONE global
    checkpoint dir, so a per-test tmp_path only takes effect for whichever
    checkpoint test runs first (conftest fixture docstring)."""
    from duckdb_age_spark.operators.dedup import connected_components
    from duckdb_age_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 9)], "id long")
    ckpt = reliable_ckpt_dir

    local_cc = {r.id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    rel_cc = {
        r.id: r.cluster_id
        for r in connected_components(edges, nodes, checkpoint_dir=ckpt).collect()
    }
    assert local_cc == rel_cc == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}

    local_bfs = {r.node: r.hops for r in bfs_hops(edges, source=1, max_hops=3).collect()}
    rel_bfs = {
        r.node: r.hops
        for r in bfs_hops(edges, source=1, max_hops=3, checkpoint_dir=ckpt).collect()
    }
    assert local_bfs == rel_bfs == {1: 0, 2: 1, 3: 2}
    # the reliable mode actually wrote checkpoint data
    import os

    assert any(os.scandir(ckpt))


def test_hll_estimate_accuracy_and_exact_ints(spark):
    """HLL on 5000 known-distinct ids: estimate within ~3 standard errors
    (1.04/sqrt(256) ≈ 6.5%), register sum integral and within bounds."""
    from duckdb_age_spark.operators.sketch import hll_estimate

    df = spark.range(5000).select(F.col("id").alias("event_id"))
    r = hll_estimate(df, "event_id", b=8).collect()[0]
    assert r.exact_n == 5000
    assert abs(r.hll_est - 5000) / 5000 < 0.20
    assert 0 < r.s_scaled <= 256 * (1 << 53)
    assert r.err_bp == int(abs(r.hll_est - 5000) / 5000 * 10000)


def test_kmv_exact_below_k_and_estimates_above(spark):
    """A group with < k distinct values reports the exact count; a group
    with ≫ k reports a (k-1)*2^60/kth estimate in a sane band."""
    from duckdb_age_spark.operators.sketch import kmv_estimate

    small = [("s", i) for i in range(10)]
    big = [("b", i) for i in range(5000)]
    df = spark.createDataFrame(small + big, "g string, v long")
    rows = {r.g: r for r in kmv_estimate(df, "g", "v", k=64).collect()}
    assert rows["s"].kmv_est == 10.0 and rows["s"].exact_n == 10
    assert abs(rows["b"].kmv_est - 5000) / 5000 < 0.5
    assert rows["b"].n_keys == 64


def test_kmv_union_merges_sketches_only(spark):
    """Union estimate of two overlapping groups derives from the k-minima
    lists; with ≤ k distinct keys overall it is EXACT."""
    from duckdb_age_spark.operators.sketch import kmv_union_estimate

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_union_estimate(df, "g", "v", ["a", "b"], k=64).collect()[0]
    assert r.exact_n == 50 and r.kmv_est == 50.0 and r.union_of == "a+b"


def test_chunk_documents_grid_and_overlap(spark):
    """Chunk grid: stride = size-overlap, tail clamped, overlap tokens
    shared verbatim between consecutive chunks."""
    from duckdb_age_spark.operators.pipeline import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    docs = spark.createDataFrame([(1, text), (2, "a b")], "doc_id long, text string")
    rows = chunk_documents(docs, size=64, overlap=16).collect()
    d1 = [r for r in rows if r.doc_id == 1]
    # 100 tokens, size 64, stride 48 -> chunks at 0 and 48
    assert [(r.chunk_id, r.start_tok, r.chunk_tokens) for r in d1] == [(0, 0, 64), (1, 48, 52)]
    d2 = [r for r in rows if r.doc_id == 2]
    assert [(r.chunk_id, r.chunk_tokens) for r in d2] == [(0, 2)]


def test_chunking_is_shuffle_free(spark):
    """Chunking must stay embarrassingly parallel: the only exchange in the
    plan is the presentation orderBy's range partitioning — the explode and
    slicing run map-side with no data shuffle."""
    from duckdb_age_spark.operators.pipeline import chunk_documents
    from duckdb_age_spark.plans import count_exchanges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert count_exchanges(chunk_documents(docs)) <= 1


def test_kfold_partitions_every_doc_exactly_once(spark):
    from duckdb_age_spark.operators.pipeline import kfold_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = kfold_split(docs, k=5).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sorted(r.fold for r in rows) == [0, 1, 2, 3, 4]


def test_decayed_revenue_exact_weights(spark):
    """Two events 1 day apart: on day 2 the decayed sum is cents2 + cents1/2."""
    from duckdb_age_spark.operators.events import decayed_revenue

    rows = [
        (1, "2024-01-01 00:00:00", "purchase", 10.0),
        (2, "2024-01-02 00:00:00", "purchase", 4.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    got = {r.day: r.decayed_rev for r in decayed_revenue(events, half_lives=20).collect()}
    assert got["2024-01-01"] == 10.0
    assert got["2024-01-02"] == 4.0 + 5.0  # 4 + 10/2


def test_quantile_interp_known_values(spark):
    """5 values 1..5: q1=2.0, q2=3.0, q3=4.0; 4 values 1..4: q2=2.5."""
    from duckdb_age_spark.operators.stats import quantile_interp

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [("b", float(v)) for v in (1, 2, 3, 4)]
    events = spark.createDataFrame(rows, "event_type string, value double")
    got = {(r.event_type, r.q): r.quantile_val for r in quantile_interp(events).collect()}
    assert got[("a", 1)] == 2.0 and got[("a", 2)] == 3.0 and got[("a", 3)] == 4.0
    assert got[("b", 2)] == 2.5
    assert got[("b", 1)] == 1.75  # (n-1)*q/4 = 0.75 -> 1 + 0.75*(2-1)


def test_clustering_coefficient_known_graph(spark):
    """Triangle 1-2-3 plus pendant 3-4: nodes 1,2 coeff=1, node 3 has
    deg 3 and 1 triangle -> 2*1/(3*2) = 1/3; node 4 deg 1 excluded."""
    from duckdb_age_spark.operators.graph import clustering_coefficient

    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long")
    rows = {r.node: r for r in clustering_coefficient(edges, k=10).collect()}
    assert rows[1].coeff_ppm == 1000000 and rows[2].coeff_ppm == 1000000
    assert rows[3].coeff_ppm == 333333 and rows[3].deg == 3 and rows[3].n_tri == 1
    assert 4 not in rows


def test_readability_exact_rational(spark):
    """'Hello world.' -> w=2, s=1, sy=3 (e-o / o / unknown? 'Hello'->e,o; 'world.'->o):
    flesch = 206.835 - 1.015*2 - 84.6*(3/2)."""
    from duckdb_age_spark.operators.text import readability_scores

    docs = spark.createDataFrame([(1, "Hello world.", "en")], "doc_id long, text string, lang string")
    r = readability_scores(docs).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (2, 1, 3)
    expect = (206835 * 1 * 2 - 1015 * 2 * 2 - 84600 * 3 * 1) / (1000 * 1 * 2)
    assert r.flesch == expect


def test_image_histogram_matches_bincount(spark):
    """Histogram over a real encoded BMP equals numpy's reference bincount
    of the pixel buffer; WAV payloads and malformed bytes are skipped."""
    import numpy as np

    from duckdb_age_spark.operators.multimodal import (
        encode_bmp,
        encode_wav,
        image_byte_histogram,
    )

    bmp = encode_bmp(5, 3, seed=42)
    expected = np.bincount(np.frombuffer(bmp, np.uint8, offset=54) // 16, minlength=16)
    media = spark.createDataFrame(
        [
            (42, "image/bmp", bytearray(bmp), "{}"),
            (7, "audio/wav", bytearray(encode_wav(100, seed=7)), "{}"),
            (9, "image/bmp", bytearray(b"not a bmp at all, truncated"), "{}"),
        ],
        "media_id long, kind string, payload binary, meta_json string",
    )
    rows = image_byte_histogram(media).collect()
    assert {r.media_id for r in rows} == {42}
    got = {r.bin: r.n_bytes for r in rows}
    assert got == {int(b): int(c) for b, c in enumerate(expected) if c > 0}


def test_ts_sniff_distinguishes_int96_from_true_nanos(spark, tmp_path):
    """All three events-ts layouts a user can feed us: int64-µs (driver
    fixtures since r4), INT96 (stock Spark default output — pyarrow calls
    it ns but Spark reads it natively), and true INT64 TIMESTAMP(NANOS)
    (driver fixtures through r3 — needs the nanosAsLong escape hatch).
    Only the last may sniff as nanos."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_age_spark.sources.tables import events_ts_is_nanos

    ts = pd.to_datetime(["2024-01-01 00:00:00"])
    us_path = str(tmp_path / "us.parquet")
    pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}), us_path)
    assert events_ts_is_nanos(us_path) is False

    int96_path = str(tmp_path / "int96.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("ns"))}),
        int96_path,
        use_deprecated_int96_timestamps=True,
    )
    assert events_ts_is_nanos(int96_path) is False

    ns_path = str(tmp_path / "ns.parquet")
    pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("ns"))}), ns_path)
    assert events_ts_is_nanos(ns_path) is True


def test_weighted_sssp_known_graph(spark):
    """Diamond: 1-2 (w1), 2-4 (w1), 1-3 (w5), 3-4 (w1): dist(4)=2 via 2,
    dist(3)=3 via 4 (not 5 direct); undirected relaxation, source=min id."""
    from duckdb_age_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 4, 1), (1, 3, 5), (3, 4, 1)], "src long, dst long, w long"
    )
    got = {r.node: r.dist for r in weighted_sssp(edges, rounds=4).collect()}
    assert got == {1: 0, 2: 1, 3: 3, 4: 2}


def test_range_search_threshold_cuts_identically(spark):
    """Self-similar pair above tau is returned; orthogonal pair is not."""
    from duckdb_age_spark.operators.similarity import queries_from_ids, range_search

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = range_search(emb, queries_from_ids(emb, [0]), tau=0.5).collect()
    assert [(r.query_id, r.vec_id) for r in rows] == [(0, 1)]
    assert rows[0].cosine > 0.99


def test_poisson_bootstrap_ci_properties(spark):
    """CI brackets the sample mean on well-behaved data; weights are a
    genuine Poisson draw (expected total replication ~ n per resample)."""
    from duckdb_age_spark.operators.stats import poisson_bootstrap_ci

    orders = spark.range(2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 100).cast("double").alias("o_totalprice"),
    )
    got = {r.stat: r.value for r in poisson_bootstrap_ci(orders, n_resamples=40).collect()}
    assert set(got) == {"ci_lo", "ci_mid", "ci_hi", "mean_full"}
    assert got["ci_lo"] <= got["ci_mid"] <= got["ci_hi"]
    # mean of 0..99 repeating = 49.5; CI must bracket it tightly (sd of the
    # bootstrap mean ~ sd/sqrt(n) ~ 29/45 ~ 0.65)
    assert got["ci_lo"] <= got["mean_full"] <= got["ci_hi"]
    assert abs(got["mean_full"] - 49.5) < 0.01
    assert got["ci_hi"] - got["ci_lo"] < 5.0


def test_containment_detects_subset_where_jaccard_blind(spark):
    """A 3-gram-subset doc shows containment 10^6 ppm while its Jaccard
    against the superset is far below the near-dup threshold."""
    from duckdb_age_spark.operators.dedup import ngram_containment_pairs

    long_text = " ".join(f"w{i}" for i in range(100))
    short_text = " ".join(f"w{i}" for i in range(20))  # strict prefix
    corpus = spark.createDataFrame(
        [(1, short_text), (2, long_text)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = ngram_containment_pairs(corpus, pairs).collect()[0]
    assert r.contain_ab_ppm == 1000000          # short fully inside long
    assert r.contain_ba_ppm < 250000            # long mostly NOT in short
    assert r.n_common == 18                     # 20 words -> 18 3-grams


def test_chunk_grid_covers_every_token_no_gaps(spark):
    """Property over varied lengths: chunk starts stride uniformly, the
    union of [start, start+chunk_tokens) covers [0, n) with overlap
    exactly at the seams, and the final chunk always reaches token n."""
    from duckdb_age_spark.operators.pipeline import chunk_documents

    docs = spark.createDataFrame(
        [(n, " ".join(f"t{i}" for i in range(n))) for n in (1, 15, 16, 17, 47, 48, 49, 64, 65, 200)],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, size=16, overlap=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert chunks[0].start_tok == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok == a.start_tok + 12  # stride = size - overlap
            assert a.start_tok + a.chunk_tokens >= b.start_tok  # no gap
        last = chunks[-1]
        assert last.start_tok + last.chunk_tokens == n  # tail reaches the end


def test_hll_and_kmv_invariant_under_partitioning(spark):
    """Sketch cells must not depend on physical layout: the same data at
    1 and 17 partitions produces identical registers/minima/estimates."""
    from duckdb_age_spark.operators.sketch import hll_estimate, kmv_estimate

    base = spark.range(3000).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).cast("string").alias("g")
    )
    r1 = hll_estimate(base.coalesce(1), "event_id", b=8).collect()[0]
    r17 = hll_estimate(base.repartition(17), "event_id", b=8).collect()[0]
    assert tuple(r1) == tuple(r17)
    k1 = {r.g: tuple(r) for r in kmv_estimate(base.coalesce(1), "g", "event_id", k=32).collect()}
    k17 = {r.g: tuple(r) for r in kmv_estimate(base.repartition(17), "g", "event_id", k=32).collect()}
    assert k1 == k17


def test_hll_merge_equals_direct_union_sketch(spark):
    """Merging per-group registers by bucket-max must give the IDENTICAL
    estimate a direct HLL over the union would give — the mergeability
    law, asserted cell-for-cell via s_scaled."""
    from duckdb_age_spark.operators.sketch import hll_estimate, hll_merge_estimate

    rows = [("a", i) for i in range(2000)] + [("b", i) for i in range(1500, 3500)]
    df = spark.createDataFrame(rows, "g string, v long")
    merged = hll_merge_estimate(df, "g", "v", ["a", "b"]).collect()[0]
    direct = hll_estimate(df.select("v"), "v").collect()[0]
    assert merged.s_scaled == direct.s_scaled
    assert merged.hll_est == direct.hll_est
    assert merged.exact_n == 3500


def test_modularity_known_partition(spark):
    """Two triangles joined by one bridge, labeled as their natural
    communities: Q = sum(e_c*4m - deg_c^2)/(4m^2) with m=7,
    e_c=3, deg_c=7 each -> 2*(84-49)/196 = 70/196."""
    from duckdb_age_spark.operators.graph import community_modularity

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)], "node long, label long"
    )
    rows = community_modularity(edges, labels, k=10).collect()
    assert {r.label for r in rows} == {10, 20}
    for r in rows:
        assert r.e_in == 3 and r.deg_sum == 7
        assert r.q_contrib_num == 3 * 4 * 7 - 49
        assert r.q_total == (2 * (84 - 49)) / (4.0 * 49)


def test_pq_codebook_partitions_all_vectors(spark):
    """Every vector is assigned exactly once per subspace; centroid
    vectors assign to themselves with zero reconstruction error."""
    from duckdb_age_spark.operators.similarity import pq_codebook_stats

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    rows = pq_codebook_stats(emb, n_subspaces=4, n_codes=16).collect()
    per_sub: dict[int, int] = {}
    for r in rows:
        per_sub[r.subspace] = per_sub.get(r.subspace, 0) + r.n_vecs
    assert per_sub == {0: n, 1: n, 2: n, 3: n}
    assert all(r.total_err_micro >= 0 for r in rows)


def test_scd2_apply_close_open_noop_insert(spark):
    """All three CDC cases: changed attr closes+opens, equal attr no-ops
    (idempotent), unseen key inserts fresh current row."""
    import datetime

    from duckdb_age_spark.operators.relational import scd2_apply_changes

    d = datetime.date
    hist = spark.createDataFrame(
        [(1, "A", d(2020, 1, 1), None), (2, "B", d(2020, 1, 1), None)],
        "key long, attr string, valid_from date, valid_to date",
    )
    chg = spark.createDataFrame(
        [(1, "X", d(2021, 6, 1)), (2, "B", d(2021, 6, 1)), (3, "C", d(2021, 6, 1))],
        "key long, new_attr string, change_date date",
    )
    rows = [(r.key, r.attr, str(r.valid_from), str(r.valid_to) if r.valid_to else None)
            for r in scd2_apply_changes(hist, chg).collect()]
    assert (1, "A", "2020-01-01", "2021-06-01") in rows  # closed
    assert (1, "X", "2021-06-01", None) in rows          # opened
    assert (2, "B", "2020-01-01", None) in rows          # no-op, still current
    assert (3, "C", "2021-06-01", None) in rows          # insert
    assert len(rows) == 4


def test_link_prediction_square_graph(spark):
    """4-cycle 1-2-3-4: the two diagonals are the only non-adjacent pairs,
    each with 2 common neighbors and Jaccard 2/(2+2-2) = 1e6 ppm."""
    from duckdb_age_spark.operators.graph import link_prediction

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long")
    rows = link_prediction(edges, k=10).collect()
    assert {(r.node_a, r.node_b) for r in rows} == {(1, 3), (2, 4)}
    assert all(r.common == 2 and r.jaccard_ppm == 1000000 for r in rows)


def test_spearman_monotone_and_antitone(spark):
    """Perfectly monotone data gives rho == 1.0 exactly (doubled ranks
    cancel); reversing one variable flips the sign."""
    from duckdb_age_spark.operators.stats import spearman_corr

    n = 50
    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(n)], "l_quantity double, l_extendedprice double"
    )
    # the IEEE chain is deterministic but not algebraically exact: 1 - 1ulp
    assert abs(spearman_corr(mono).collect()[0].rho - 1.0) < 1e-12
    anti = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(n)], "l_quantity double, l_extendedprice double"
    )
    assert abs(spearman_corr(anti).collect()[0].rho + 1.0) < 1e-12


def test_share_of_parent_sums_to_whole(spark, sf_dir):
    """Within each region the nation ppm shares sum to ~10^6 (floor-div
    truncation loses < n_nations ppm); region shares likewise."""
    from duckdb_age_spark.operators.relational import revenue_share_of_parent
    from duckdb_age_spark.sources import read_table

    out = revenue_share_of_parent(
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "nation"),
        read_table(spark, sf_dir, "region"),
    ).collect()
    by_region: dict[str, int] = {}
    region_ppm: dict[str, int] = {}
    for r in out:
        by_region[r.r_name] = by_region.get(r.r_name, 0) + r.share_of_region_ppm
        region_ppm[r.r_name] = r.region_share_ppm
    for region, total in by_region.items():
        assert 1000000 - 10 <= total <= 1000000, (region, total)
    s = sum(region_ppm.values())
    assert 1000000 - 10 <= s <= 1000000, s


def test_tv_distance_bounds_and_identity(spark):
    """A source identical to the corpus distribution has TVD 0; a source
    with disjoint vocabulary approaches its share of separation."""
    from duckdb_age_spark.operators.text import source_tv_distance

    same = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2")], "doc_id long, text string, source string"
    )
    rows = {r.source: r.tvd_ppm for r in source_tv_distance(same).collect()}
    assert rows == {"s1": 0, "s2": 0}

    disjoint = spark.createDataFrame(
        [(1, "a a a", "s1"), (2, "b b b", "s2")], "doc_id long, text string, source string"
    )
    rows = {r.source: r.tvd_ppm for r in source_tv_distance(disjoint).collect()}
    # each source: p_s(own tok)=1 vs p_c=0.5 -> |1-.5|+|0-.5| = 1, /2 = 0.5
    assert rows == {"s1": 500000, "s2": 500000}


def test_bootstrap_mixer_split_multiply_equivalence():
    """The bootstrap key mixer evaluates (mix·MULT) mod 2^60 as a split
    multiply so every intermediate fits signed 64-bit (stats.py docstring).
    Property-test the split form against Python's arbitrary-precision
    product over the full mix range, including the boundary values."""
    import random

    from duckdb_age_spark.operators.stats import MIX_K_B, MIX_MOD60, MIX_MULT

    m0, m1 = MIX_MULT & 0xFFFFFFFF, MIX_MULT >> 32

    def split(mix):
        a0, a1 = mix % (1 << 30), mix >> 30
        t = (
            (a0 * m0) % MIX_MOD60
            + (((a0 * m1) % (1 << 28)) << 32)
            + (((a1 * m0) % (1 << 30)) << 30)
        )
        assert t < 1 << 63  # the no-overflow bound both engines rely on
        return t % MIX_MOD60

    rng = random.Random(7)
    max_mix = (MIX_MOD60 - 1) + 63 * MIX_K_B  # h < 2^60, b < 64
    cases = [0, 1, MIX_MOD60 - 1, max_mix] + [rng.randrange(max_mix) for _ in range(50_000)]
    for mix in cases:
        assert split(mix) == (mix * MIX_MULT) % MIX_MOD60, mix


def test_hll_small_range_linear_counting(spark):
    """ADVICE r6: below ~2.5·m the raw HLL estimator is systematically
    biased; the linear-counting branch (E = m·ln(m/V)) must kick in and
    land near the exact count.  50 distinct values at m=256 sit deep in
    the correction range."""
    import math

    from duckdb_age_spark.operators.sketch import hll_estimate

    df = spark.range(50).select((F.col("id") * 977 + 13).cast("string").alias("v"))
    row = hll_estimate(df, "v", b=8).first()
    assert row.exact_n == 50
    # corrected estimate is close (linear counting is near-exact when
    # V ≈ m): within 10% of truth
    assert abs(row.hll_est - 50) / 50 < 0.10, row
    # and the branch actually fired: it differs from the raw harmonic
    # estimate, which at this range is biased upward by alpha-related bias
    from duckdb_age_spark.operators.sketch import hll_alpha

    m, rmax = 256, 53
    raw = hll_alpha(m) * m * m * float(1 << rmax) / float(row.s_scaled)
    assert row.hll_est != raw
    # exact linear-counting replay: V = m - n_buckets
    v = m - row.n_buckets
    assert math.isclose(row.hll_est, m * math.log(m / v), rel_tol=1e-12)


def test_image_histogram_ignores_trailing_bytes(spark):
    """ADVICE r6: a valid BMP may carry bytes AFTER the pixel array; the
    histogram must bucket only the decoded pixel buffer.  The same image
    with and without 64 trailing 0xFF bytes must histogram identically."""
    from duckdb_age_spark.operators.multimodal import encode_bmp, image_byte_histogram

    img = encode_bmp(4, 3, seed=5)
    rows = [(1, "image/bmp", bytearray(img)), (2, "image/bmp", bytearray(img + b"\xff" * 64))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = image_byte_histogram(df).collect()
    h1 = {(r.bin): r.n_bytes for r in out if r.media_id == 1}
    h2 = {(r.bin): r.n_bytes for r in out if r.media_id == 2}
    assert h1 == h2 and h1, out
    # with the old unbounded frombuffer, the 0xFF run would inflate bin 15


def test_markov_steady_state_two_state_chain(spark):
    """Known 2-state chain: P(A->A)=0.8, P(B->A)=0.5 gives steady state
    pi_A = 5/7.  The integer ppm iteration from uniform must land within
    floor-loss distance of the analytic fixed point, and total mass can
    only shed ppm (floor division), never grow."""
    from duckdb_age_spark.operators.relational import markov_steady_state

    rows = []
    pairs = [("A", "A")] * 8 + [("A", "B")] * 2 + [("B", "A")] * 5 + [("B", "B")] * 5
    for i, (p, q) in enumerate(pairs):
        rows.append((i, p, "2024-01-01", i * 2))
        rows.append((i, q, "2024-01-02", i * 2 + 1))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderpriority string, o_orderdate string, o_orderkey long"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = {r.state: r.steady_ppm for r in markov_steady_state(df, rounds=8).collect()}
    assert set(out) == {"A", "B"}
    # degenerate inputs degrade to empty, matching the oracle's inner-join
    # rounds: no transitions at all, and a chain whose mass dies out
    single = spark.createDataFrame(
        [(1, "A", "2024-01-01", 1)],
        "o_custkey long, o_orderpriority string, o_orderdate string, o_orderkey long",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    assert markov_steady_state(single, rounds=3).count() == 0
    one_hop = spark.createDataFrame(
        [(1, "A", "2024-01-01", 1), (1, "B", "2024-01-02", 2)],
        "o_custkey long, o_orderpriority string, o_orderdate string, o_orderkey long",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    # A->B only: B has no outgoing, so all mass dies by round 2 -> empty
    assert markov_steady_state(one_hop, rounds=3).count() == 0
    assert abs(out["A"] - 714286) < 2500, out   # 5/7 of 1e6
    assert abs(out["B"] - 285714) < 2500, out   # 2/7 of 1e6
    assert 995000 <= out["A"] + out["B"] <= 1000000


def test_streaming_tvd_drift_zero_for_identical_mix(spark, tmp_path):
    """A window whose type mix equals the global mix must score 0 ppm;
    a skewed window must score > 0.  Days 1-2 share the same 3:1 mix,
    day 3 is all-purchase."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_age_spark.streaming import tvd_drift_update_drain

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "src"
    src.mkdir()
    rows = []
    for day in (1, 2):
        rows += [(datetime(2024, 1, day, 10, i), "view") for i in range(3)]
        rows += [(datetime(2024, 1, day, 11, 0), "purchase")]
    rows += [(datetime(2024, 1, 3, 10, i), "purchase") for i in range(4)]
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([t for t, _ in rows], pa.timestamp("us")),
                "event_type": pa.array([e for _, e in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        ),
        str(src / "f.parquet"),
    )
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(str(src))
    out = {r.window_sec: r.tvd_ppm for r in tvd_drift_update_drain(stream, window="1 day").collect()}
    d1 = int(datetime(2024, 1, 1).timestamp())
    d2 = int(datetime(2024, 1, 2).timestamp())
    d3 = int(datetime(2024, 1, 3).timestamp())
    # global mix: 6 view, 6 purchase.  days 1-2 (3v,1p) differ from the
    # 50:50 global -> TVD = |3/4-1/2| = 1/4 -> 250000 ppm; day 3 (0v,4p)
    # -> TVD = 1/2 -> 500000 ppm
    assert out[d1] == 250000 and out[d2] == 250000, out
    assert out[d3] == 500000, out


def test_flip_bmp_involution_and_row_inversion():
    """flip(flip(x)) == x; a flipped 2-row image has its rows swapped and
    the header untouched."""
    from duckdb_age_spark.operators.multimodal import decode_bmp, encode_bmp, flip_bmp

    img = encode_bmp(5, 4, seed=9)
    flipped = flip_bmp(img)
    assert flip_bmp(flipped) == img
    assert decode_bmp(flipped) == decode_bmp(img) == (5, 4)
    assert flipped[:54] == img[:54]
    # trailing container bytes are preserved, and flip stays an involution
    tailed = img + b"\xabCD"
    ft = flip_bmp(tailed)
    assert ft.endswith(b"\xabCD") and len(ft) == len(tailed)
    assert flip_bmp(ft) == tailed
    import struct

    off = struct.unpack_from("<I", img, 10)[0]
    row = (3 * 5 + 3) // 4 * 4
    for y in range(4):
        assert flipped[off + y * row : off + (y + 1) * row] == img[
            off + (3 - y) * row : off + (4 - y) * row
        ]


def test_flip_features_poison_degrades_to_error_row(spark):
    """A malformed payload yields an error row, never a failed stage."""
    from duckdb_age_spark.operators.multimodal import encode_bmp, flip_features

    rows = [(1, "image/bmp", bytearray(encode_bmp(3, 3, seed=1))),
            (2, "image/bmp", bytearray(b"BMgarbage"))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in flip_features(df).collect()}
    assert out[1].decode_ok == "real" and out[1].checksum is not None
    assert out[2].decode_ok.startswith("error:") and out[2].checksum is None


def test_flip_features_checksum_blockwise_exact(spark):
    """The position-weighted checksum is computed in 1 MiB blocks with a
    Python-int accumulator (ADVICE r7: a single int64 reduction wraps for
    huge images).  Pin block-boundary exactness: a pixel buffer larger
    than one block must equal the naive exact formula."""
    import struct

    from duckdb_age_spark.operators.multimodal import (
        encode_bmp,
        flip_bmp,
        flip_features,
    )

    img = encode_bmp(600, 600, seed=3)  # stride 1800 -> 1.08 MB buffer
    df = spark.createDataFrame(
        [(1, "image/bmp", bytearray(img))], "media_id long, kind string, payload binary"
    )
    row = flip_features(df).first()
    out = flip_bmp(img)
    off = struct.unpack_from("<I", out, 10)[0]
    expected = sum(b * (j + 1) for j, b in enumerate(out[off:]))  # exact: Python ints
    assert row.checksum == expected and row.decode_ok == "real"


def test_flip_bmp_involution_random_geometries():
    """Property: flip is an involution and header-preserving for any
    geometry, including widths where the row stride needs 1-3 pad bytes
    and single-row/single-column degenerate images."""
    import random

    from duckdb_age_spark.operators.multimodal import decode_bmp, encode_bmp, flip_bmp

    rng = random.Random(11)
    cases = [(1, 1), (1, 64), (64, 1), (3, 2), (4, 4)] + [
        (rng.randrange(1, 65), rng.randrange(1, 65)) for _ in range(40)
    ]
    for w, h in cases:
        img = encode_bmp(w, h, seed=w * 100 + h)
        f = flip_bmp(img)
        assert flip_bmp(f) == img, (w, h)
        assert decode_bmp(f) == (w, h)
        assert f[:54] == img[:54]
        if h > 1:
            assert f != img or w * h == 0 or _rows_identical(img, w, h)


def _rows_identical(img, w, h):
    import struct as _s

    off = _s.unpack_from("<I", img, 10)[0]
    row = (3 * w + 3) // 4 * 4
    rows = {img[off + y * row : off + (y + 1) * row] for y in range(h)}
    return len(rows) == 1


def test_duplicated_span_census_planted(spark):
    """Two docs sharing a verbatim span at DIFFERENT offsets (the case
    position-strided selection provably misses) must both flag duplicated
    anchors; a unique doc flags none; a doc shorter than the window is
    excluded entirely."""
    from duckdb_age_spark.operators.dedup import duplicated_span_census

    shared = (
        "the quick brown fox jumps over the lazy dog today and "
        "every mirror of this page carries this exact sentence"
    )
    docs = spark.createDataFrame(
        [
            (1, shared + " plus a unique tail written only here for doc one x"),
            (2, "completely different opening words " + shared),
            (3, "x" * 23),  # one char short of a window
            (4, "this document shares nothing with any other one and is long enough"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_span_census(docs, k=24, anchor_mod=8).collect()}
    assert 3 not in out
    assert out[4].n_dup_anchors == 0 and out[4].dup_ppm == 0
    # offsets differ by 35 (not ≡ 0 mod 8): content-defined anchors still hit
    assert out[1].n_dup_anchors >= 1 and out[2].n_dup_anchors >= 1
    for r in out.values():
        assert 0 <= r.n_dup_anchors <= r.n_anchors
        assert r.dup_ppm == r.n_dup_anchors * 1_000_000 // r.n_anchors


def test_duplicated_span_census_exact_copy_full_ppm(spark):
    """An exact copy selects the identical anchor set in both docs, so
    every anchor is duplicated and dup_ppm = 10⁶ for both."""
    from duckdb_age_spark.operators.dedup import duplicated_span_census

    text = (
        "some boilerplate sentence that repeats verbatim across mirrors "
        "and keeps repeating long enough to guarantee several anchors"
    )
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = duplicated_span_census(docs, k=24, anchor_mod=8).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_anchors >= 1
        assert r.n_dup_anchors == r.n_anchors and r.dup_ppm == 1_000_000


def test_ngram_novelty_copy_scores_zero(spark):
    """Doc 0's grams are all first sightings (novel_ppm = 10⁶); an exact
    later copy is all re-sightings (0); a half-overlapping doc lands
    strictly between."""
    from duckdb_age_spark.operators.pipeline import ngram_novelty

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),
            (2, base + " iota kappa lambda mu nu xi omicron pi rho"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, n=5).collect()}
    assert out[0].novel_ppm == 1_000_000
    assert out[1].novel_ppm == 0 and out[1].n_novel == 0
    assert 0 < out[2].novel_ppm < 1_000_000
    assert out[0].n_grams == out[1].n_grams  # identical text, identical grams


def test_hits_star_graph_exact_fixed_point(spark):
    """Hand-computed 2-round HITS on h1→{a1,a2}, h2→a1: every integer
    intermediate is checkable by hand, so the assert pins the exact
    L1-normalized fixed-point values (floor divisions included)."""
    from duckdb_age_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 1)], "src long, dst long"
    )
    out = {r.node: (r.hub, r.auth) for r in hits_scores(edges, n_iter=2).collect()}
    # round 1: a'=(2S, S) -> auth=(666666, 333333); h'=(999999, 666666)
    #   -> hub=(600000, 400000)
    # round 2: a'=(1000000, 600000) -> auth=(625000, 375000)
    #   h'=(1000000, 625000) -> hub=(615384, 384615)
    assert out[10] == (615384, 0)
    assert out[20] == (384615, 0)
    assert out[1] == (0, 625000)
    assert out[2] == (0, 375000)


def test_ewma_volume_known_sequence(spark, tmp_path):
    """Hour volumes 4, 2, gap, 8: the bounded power-of-two EWMA at each
    present hour is hand-computable, including gap renormalization (the
    missing hour contributes neither numerator nor denominator)."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_age_spark.streaming import ewma_volume_drain

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "src"
    src.mkdir()
    ts = (
        [datetime(2024, 1, 1, 0, i) for i in range(4)]
        + [datetime(2024, 1, 1, 1, i) for i in range(2)]
        + [datetime(2024, 1, 1, 3, i) for i in range(8)]
    )
    pq.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("us"))}),
        str(src / "f.parquet"),
    )
    stream = spark.readStream.schema("ts timestamp").parquet(str(src))
    out = {
        r.window_sec: (r.n_events, r.ewma_x100)
        for r in ewma_volume_drain(stream, window="1 hour", span=8).collect()
    }
    h0 = int(datetime(2024, 1, 1, 0).timestamp())
    # h0: 4*128*100 // 128 = 400
    assert out[h0] == (4, 400)
    # h1: (2*128 + 4*64)*100 // (128+64) = 51200 // 192 = 266
    assert out[h0 + 3600] == (2, 266)
    # gap hour emits nothing
    assert h0 + 7200 not in out
    # h3: (8*128 + 2*32 + 4*16)*100 // (128+32+16) = 115200 // 176 = 654
    assert out[h0 + 3 * 3600] == (8, 654)


def test_last_touch_attribution_rules(spark):
    """Purchase credits the latest PRECEDING non-purchase touch of the same
    user; a purchase with no prior event is 'direct'; later events never
    attribute backwards; back-to-back purchases reuse the same last touch."""
    from datetime import datetime

    from duckdb_age_spark.operators.events import last_touch_attribution

    rows = [
        # user 1: view -> click -> purchase  => click
        (1, datetime(2024, 1, 1, 0), 1, "view", 0.0),
        (2, datetime(2024, 1, 1, 1), 1, "click", 0.0),
        (3, datetime(2024, 1, 1, 2), 1, "purchase", 10.00),
        # user 2: purchase first => direct; then error -> purchase => error
        (4, datetime(2024, 1, 2, 0), 2, "purchase", 5.50),
        (5, datetime(2024, 1, 2, 1), 2, "error", 0.0),
        (6, datetime(2024, 1, 2, 2), 2, "purchase", 1.25),
        # user 3: view -> purchase -> purchase => view credited twice
        (7, datetime(2024, 1, 3, 0), 3, "view", 0.0),
        (8, datetime(2024, 1, 3, 1), 3, "purchase", 2.00),
        (9, datetime(2024, 1, 3, 2), 3, "purchase", 3.00),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.channel: (r.n_purchases, r.revenue_cents) for r in last_touch_attribution(events).collect()}
    assert out == {
        "click": (1, 1000),
        "direct": (1, 550),
        "error": (1, 125),
        "view": (2, 500),
    }


def test_span_pairs_planted_and_threshold(spark):
    """Docs sharing a long span at different offsets must pair; the
    min_shared=2 floor suppresses single-collision pairs; disjoint docs
    never pair."""
    from duckdb_age_spark.operators.dedup import duplicated_span_pairs

    shared = (
        "the quick brown fox jumps over the lazy dog today and "
        "every mirror of this page carries this exact sentence"
    )
    docs = spark.createDataFrame(
        [
            (1, shared + " plus a unique tail written only here"),
            (2, "completely different opening words " + shared),
            (3, "this document shares nothing with either of the others above"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in duplicated_span_pairs(docs).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] >= 2


def test_span_pairs_hot_anchor_capped(spark):
    """An anchor shared by 60 near-identical docs would form C(60,2)=1770
    pairs; with max_bucket=10 the bucket is dropped from candidate
    generation entirely (bounded work), and an independent 2-doc span
    still pairs."""
    from duckdb_age_spark.operators.dedup import duplicated_span_pairs

    boiler = (
        "subscribe to our newsletter for daily updates and exclusive offers "
        "delivered straight to your inbox every single morning"
    )
    uniq = (
        "an entirely unrelated pair of documents that share this one "
        "particular long sentence and absolutely nothing else at all"
    )
    rows = [(i, boiler) for i in range(60)]
    rows += [(100, uniq + " first tail"), (101, "prefix words then " + uniq)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in duplicated_span_pairs(docs, max_bucket=10).collect()}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), pairs  # boilerplate block dropped


def test_mips_ranks_by_magnitude_not_angle(spark):
    """A long vector must beat a perfectly-aligned short one under MIPS —
    the exact case cosine inverts."""
    from duckdb_age_spark.operators.similarity import mips_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),        # query
            (1, [10.0, 10.0]),      # misaligned but long: dot = 10
            (2, [0.5, 0.0]),        # perfectly aligned, short: dot = 0.5
        ],
        "vec_id long, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = [(r.vec_id, r.dot, r.rank) for r in mips_topk(emb, q, k=2).collect()]
    assert out == [(1, 10.0, 1), (2, 0.5, 2)]


def test_rfm_segments_tiles_and_census(spark):
    """10 users with strictly increasing recency/frequency/monetary land
    in deterministic quintiles; census covers all users exactly once and
    revenue matches."""
    from datetime import datetime

    from duckdb_age_spark.operators.events import rfm_segments

    rows = []
    eid = 0
    for u in range(10):
        # user u: u+1 purchases, each of value (u+1) dollars, last at hour u
        for p in range(u + 1):
            rows.append((eid, datetime(2024, 1, 1, u, p), u, "purchase", float(u + 1)))
            eid += 1
    rows.append((eid, datetime(2024, 1, 2, 0), 99, "view", 0.0))  # non-purchaser
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = rfm_segments(events, n_tiles=5).collect()
    assert sum(r.n_users for r in out) == 10  # viewer-only user excluded
    total_cents = sum(r.revenue_cents for r in out)
    assert total_cents == sum((u + 1) * (u + 1) * 100 for u in range(10))
    # user 9 (most recent, most frequent, biggest) sits in (r=?,f=1,m=1):
    # recency ASC puts latest-last-purchase first -> user 9 has last_sec
    # closest to max -> r_tile 1
    top = [r for r in out if r.f_tile == 1 and r.m_tile == 1 and r.r_tile == 1]
    assert top and top[0].n_users >= 1


def test_audio_blocks_known_signal_and_poison(spark):
    """A 300-sample WAV yields blocks of 256 and 44 samples whose Σs² and
    peak match a direct Python replay; a poison payload degrades to one
    block=-1 error row."""
    from duckdb_age_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_block_features,
        encode_wav,
    )

    import struct as _struct

    wav = encode_wav(300, 8000, seed=7)
    # a data_len=0 WAV is VALID per decode_wav and must emit one empty
    # block row, not vanish (code-review r8)
    wav0 = _struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16, b"data", 0,
    )
    media = spark.createDataFrame(
        [
            (7, "audio/wav", bytearray(wav), "{}"),
            (8, "audio/wav", bytearray(b"RIFFjunk"), "{}"),
            (9, "audio/wav", bytearray(wav0), "{}"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {(r.media_id, r.block): r for r in audio_block_features(media, block=256).collect()}
    samples = [((7 + i) * 257) % 4096 - 2048 for i in range(300)]
    for blk, seg in ((0, samples[:256]), (1, samples[256:])):
        r = rows[(7, blk)]
        assert r.n_samples == len(seg)
        assert r.sum_sq == sum(s * s for s in seg)
        assert r.peak == max(abs(s) for s in seg)
        assert r.decode_ok == "real"
    assert rows[(8, -1)].decode_ok.startswith("error:")
    z = rows[(9, 0)]
    assert (z.n_samples, z.sum_sq, z.peak, z.decode_ok) == (0, 0, 0, "real")


def test_zipf_slope_exact_powerlaw(spark):
    """A corpus whose token counts are exactly c(r) = 2^(10-r)·r⁻⁰ ... use
    a pure power law c(r) = K·r^s with s = -1: counts 1200//r make the
    fit land near -1; a flat corpus (all counts equal) fits slope 0."""
    from duckdb_age_spark.operators.text import zipf_slope

    # build docs so that token t_r appears ~1200//r times: one doc per
    # occurrence keeps tokenization trivial
    rows = []
    i = 0
    for r in range(1, 21):
        for _ in range(1200 // r):
            rows.append((i, f"t{r:02d}"))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = zipf_slope(docs, top_n=20).collect()[0]
    assert out.n_terms == 20
    assert -1_050_000 < out.slope_ppm < -950_000, out  # ppm of slope ~ -1
    flat = spark.createDataFrame(
        [(i, f"w{i % 7}") for i in range(70)], "doc_id long, text string"
    )
    out2 = zipf_slope(flat, top_n=7).collect()[0]
    assert out2.slope_ppm == 0


def test_span_clusters_transitive_family(spark):
    """Three docs chained only pairwise (A~B and B~C share different spans)
    must land in ONE cluster; an unrelated doc stays a singleton; a
    too-short doc is outside the universe."""
    from duckdb_age_spark.operators.dedup import keep_canonical, span_dedup_clusters

    span1 = (
        "first shared boilerplate sentence that appears verbatim in "
        "document one and document two only nowhere else at all"
    )
    span2 = (
        "second shared boilerplate sentence that appears verbatim in "
        "document two and document three only nowhere else at all"
    )
    docs = spark.createDataFrame(
        [
            (1, span1 + " unique tail of the first document here"),
            (2, "middle doc starts differently " + span1 + " and then " + span2),
            (3, span2 + " entirely different ending for the third one"),
            (4, "a lonely document with no shared sentences whatsoever in it"),
            (5, "x" * 23),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.cluster_id for r in span_dedup_clusters(docs).collect()}
    assert out[1] == out[2] == out[3] == 1  # transitive closure, min id
    assert out[4] == 4
    assert 5 not in out
    kept = {r.doc_id for r in keep_canonical(
        span_dedup_clusters(docs).select("doc_id", "cluster_id")).collect()}
    assert kept == {1, 4}


def test_cusum_detects_step_shift_not_noise(spark):
    """A flat series must never alarm (CUSUM vs its own mean stays small);
    a series with a sustained step-up must alarm during the shifted
    regime, and the recurrence identity S_t = C_t - min prefix C must
    match a direct Python replay of max(0, S+(x-mean))."""
    from datetime import datetime

    from duckdb_age_spark.operators.events import cusum_shift

    def mk(vals):
        rows = [
            (i, datetime(2024, 1, 1 + i), 1, "purchase", float(v))
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

    flat = [100.0] * 20
    out = cusum_shift(mk(flat), h_mult=4).collect()
    assert all(not r.alarm for r in out)
    assert all(r.cusum_ncents == 0 for r in out)

    shifted = [100.0] * 14 + [300.0] * 6  # sustained step in the tail
    out2 = cusum_shift(mk(shifted), h_mult=4).collect()
    # replay the textbook recurrence in exact n*cent units
    cents = [round(v * 100) for v in shifted]
    n, total = len(cents), sum(cents)
    s, expect = 0, []
    for x in cents:
        s = max(0, s + (x * n - total))
        expect.append(s)
    assert [r.cusum_ncents for r in out2] == expect
    assert any(r.alarm for r in out2[14:])   # fires inside the new regime
    assert not any(r.alarm for r in out2[:14])


def test_revenue_cube_levels_and_grouping_id(spark):
    """Every CUBE level must appear exactly once with the right gid tag
    (0=cell, 1=year rolled, 2=region rolled, 3=grand total) and rolled-up
    totals must equal the sum of their children — hand-computed planted
    data, two regions x two years."""
    from datetime import datetime

    from duckdb_age_spark.operators.relational import revenue_cube

    orders = spark.createDataFrame(
        [
            (1, 10, datetime(1995, 3, 1), 10.00),
            (2, 10, datetime(1996, 3, 1), 20.00),
            (3, 20, datetime(1995, 3, 1), 40.00),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(10, 1), (20, 2)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame([(1, 1), (2, 2)], "n_nationkey long, n_regionkey long")
    region = spark.createDataFrame([(1, "EUROPE"), (2, "ASIA")], "r_regionkey long, r_name string")
    rows = {
        (r.r_name, r.o_year, r.gid): (r.revenue_cents, r.n_orders)
        for r in revenue_cube(orders, customer, nation, region).collect()
    }
    assert rows[("EUROPE", 1995, 0)] == (1000, 1)
    assert rows[("EUROPE", 1996, 0)] == (2000, 1)
    assert rows[("ASIA", 1995, 0)] == (4000, 1)
    assert rows[("EUROPE", None, 1)] == (3000, 2)   # year rolled up
    assert rows[("ASIA", None, 1)] == (4000, 1)
    assert rows[(None, 1995, 2)] == (5000, 2)       # region rolled up
    assert rows[(None, 1996, 2)] == (2000, 1)
    assert rows[(None, None, 3)] == (7000, 3)       # grand total
    assert len(rows) == 8


def test_priority_pivot_wide_and_null_holes(spark):
    """Pivot must produce one row per year with priority columns in cents
    and NULL (not 0) where a year has no orders of that priority."""
    from datetime import datetime

    from duckdb_age_spark.operators.relational import priority_pivot

    orders = spark.createDataFrame(
        [
            (1, 1, datetime(1995, 1, 1), 10.00, "1-URGENT"),
            (2, 1, datetime(1995, 6, 1), 5.50, "1-URGENT"),
            (3, 1, datetime(1995, 1, 1), 7.25, "5-LOW"),
            (4, 1, datetime(1996, 1, 1), 1.00, "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double, o_orderpriority string",
    )
    out = {r.o_year: r for r in priority_pivot(orders).collect()}
    assert list(out) == [1995, 1996]
    assert (out[1995].urgent_cents, out[1995].low_cents) == (1550, 725)
    assert out[1995].medium_cents is None
    assert out[1996].medium_cents == 100
    assert out[1996].urgent_cents is None


def test_theil_sen_is_outlier_robust_and_exact(spark):
    """A clean +200-cents/day line with two wild outlier days must still
    yield exactly 200e6 microcents/day (OLS would be dragged far off);
    the lower-median rank and truncating pair division are replayed in
    Python with int() truncation semantics."""
    from datetime import datetime, timedelta

    from duckdb_age_spark.operators.stats import theil_sen_trend

    base = datetime(2024, 1, 1)
    vals = [100.0 + 2.0 * i for i in range(15)]   # +200 cents/day
    vals[3] = 90000.0                             # wild outliers
    vals[11] = 0.01
    rows = [
        (i, base + timedelta(days=i), 1, "purchase", v) for i, v in enumerate(vals)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = theil_sen_trend(events).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_days, r.n_pairs) == (15, 105)
    # replay: pairwise truncating slopes, lower median
    cents = [round(v * 100) for v in vals]
    slopes = sorted(
        int((cents[j] - cents[i]) * 1_000_000 / (j - i))
        for i in range(15)
        for j in range(i + 1, 15)
    )
    assert r.slope_microcents_per_day == slopes[(105 + 1) // 2 - 1] == 200_000_000


def test_kmv_intersection_exact_small_and_replayed_large(spark):
    """Below k distinct union keys the sketch IS the union, so the
    intersection estimate must equal the exact overlap; above k the
    estimate must equal a bit-for-bit Python replay of the md5-key
    sketch rule (not just land within a tolerance)."""
    import hashlib
    from datetime import datetime

    from duckdb_age_spark.operators.sketch import kmv_intersection_estimate

    def mk(n_view, n_purch, overlap):
        rows, eid = [], 0
        for u in range(n_view):
            rows.append((eid, datetime(2024, 1, 1), u, "view", 1.0)); eid += 1
        for u in range(n_view - overlap, n_view - overlap + n_purch):
            rows.append((eid, datetime(2024, 1, 1), u, "purchase", 1.0)); eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

    # small: 30 view ∪ 25 purchase, 10 common -> union 45 < k=64 -> exact
    out = kmv_intersection_estimate(
        mk(30, 25, 10), "event_type", "user_id", ["view", "purchase"], k=64
    ).collect()[0]
    assert out.exact_n == 10
    assert out.n_common == 10
    assert out.inter_est == 10.0

    # large: 600 ∪ 500 with 200 common -> sketch path; replay the rule
    out = kmv_intersection_estimate(
        mk(600, 500, 200), "event_type", "user_id", ["view", "purchase"], k=64
    ).collect()[0]

    def key(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    views = sorted(key(u) for u in range(600))[:64]
    purch = sorted(key(u) for u in range(400, 900))[:64]
    union = sorted(set(views) | set(purch))[:64]
    kth = union[-1]
    n_common = len(set(views) & set(purch) & set(union))
    union_est = float(63 * (1 << 60)) / float(kth)
    expect = (float(n_common) * union_est) / 64.0
    assert out.exact_n == 200
    assert out.n_common == n_common
    assert out.inter_est == expect
    assert out.jaccard_bp == n_common * 10000 // 64


def test_importance_weights_favor_target_like_docs(spark):
    """Docs wording like the target domain must score higher than docs
    full of target-absent vocabulary, the weight must be replayed
    exactly from the smoothed-unigram definition, and every doc must get
    a row (no -inf/NULL from target-absent tokens)."""
    import math

    from duckdb_age_spark.operators.pipeline import importance_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "en", "tgt", 0),
            (2, "alpha beta gamma", "en", "other", 0),
            (3, "delta delta epsilon zeta", "en", "other", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r.mean_lw for r in importance_weights(docs, "tgt").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] > out[2] > out[3]

    # replay doc 2 exactly: corpus counts over all docs, target = doc 1
    cg = {"alpha": 3, "beta": 3, "gamma": 1, "delta": 2, "epsilon": 1, "zeta": 1}
    ct = {"alpha": 2, "beta": 2}
    tg, tt, v = sum(cg.values()), sum(ct.values()), len(cg)
    lw = {
        t: round((math.log((ct.get(t, 0) + 1) / (tt + v)) - math.log((c + 1) / (tg + v))) * 1e9)
        for t, c in cg.items()
    }
    for doc_id, toks in ((1, ["alpha", "beta", "alpha", "beta"]),
                         (2, ["alpha", "beta", "gamma"]),
                         (3, ["delta", "delta", "epsilon", "zeta"])):
        s_shift = sum(lw[t] for t in toks) + len(toks) * 32_000_000_000
        cnt = len(toks)
        milli = (2 * s_shift * 1000 + cnt * 1_000_000_000) // (2 * cnt * 1_000_000_000)
        assert out[doc_id] == milli / 1000.0 - 32.0


def test_harmonic_closeness_path_graph_exact(spark):
    """On the path 1-2-3-4-5-6 with seeds {1,2}: hand-computed exact
    micro-unit harmonic scores, including the DIV-truncation cell
    (1e6 DIV 3 = 333333) and unreached pairs contributing nothing."""
    from duckdb_age_spark.operators.graph import harmonic_closeness

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    out = {
        r.node: (r.n_seeds_reaching, r.harmonic_micro)
        for r in harmonic_closeness(edges, n_seeds=2, max_hops=3).collect()
    }
    third = 1_000_000 // 3
    # node: d(1,.), d(2,.) within 3 hops -> sum(1e6 DIV d)
    assert out[1] == (1, 1_000_000)                  # only seed 2 at d=1
    assert out[2] == (1, 1_000_000)                  # only seed 1 at d=1
    assert out[3] == (2, 500_000 + 1_000_000)        # d=2 from 1, d=1 from 2
    assert out[4] == (2, third + 500_000)            # d=3 from 1, d=2 from 2
    assert out[5] == (1, third)                      # d=4 from 1 unreached
    assert 6 not in out                             # beyond 3 hops from both seeds


def _bmp_from_gray(rows):
    """24-bit BMP with pixel (x, y) = gray rows[y][x] (top-down list,
    written bottom-up per the container spec)."""
    import struct as _s

    h, w = len(rows), len(rows[0])
    rowb = (3 * w + 3) // 4 * 4
    pix = bytearray()
    for y in range(h - 1, -1, -1):
        line = bytearray()
        for x in range(w):
            line += bytes([rows[y][x]] * 3)
        line += b"\0" * (rowb - len(line))
        pix += line
    header = _s.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return bytes(header + info + pix)


def test_ahash_structure_and_hamming_pairs(spark):
    """Bright-top/dark-bottom images must set exactly the 32 top-half
    cell bits (image rows 0-3 -> k 0..31 -> lo = 2^32-1, hi = 0); a
    one-cell perturbation lands at Hamming 1 and pairs with it; the
    inverted image (hi all-set) is Hamming 64 away and must NOT pair.
    Hash bits computed structurally, not snapshot."""
    from duckdb_age_spark.operators.multimodal import ahash_dup_pairs, ahash_features

    top_bright = [[200] * 8 for _ in range(4)] + [[10] * 8 for _ in range(4)]
    perturbed = [r[:] for r in top_bright]
    perturbed[7][7] = 255  # one bottom cell jumps above the mean
    bot_bright = [[10] * 8 for _ in range(4)] + [[200] * 8 for _ in range(4)]
    media = spark.createDataFrame(
        [
            (1, "image/bmp", _bmp_from_gray(top_bright), "{}"),
            (2, "image/bmp", _bmp_from_gray(perturbed), "{}"),
            (3, "image/bmp", _bmp_from_gray(bot_bright), "{}"),
            (4, "audio/wav", b"not an image", "{}"),   # skipped, not an error
        ],
        "media_id long, kind string, payload binary, meta_json string",
    )
    feats = {r.media_id: (r.ahash_hi, r.ahash_lo) for r in ahash_features(media).collect()}
    assert set(feats) == {1, 2, 3}
    assert feats[1] == (0, (1 << 32) - 1)        # top half above mean
    assert feats[3] == ((1 << 32) - 1, 0)        # inverted
    ha, la = feats[2]
    assert bin(ha ^ feats[1][0]).count("1") + bin(la ^ feats[1][1]).count("1") == 1
    pairs = {(r.a, r.b): r.hamming for r in ahash_dup_pairs(media, max_hamming=4).collect()}
    assert pairs == {(1, 2): 1}


def test_ahash_hot_band_cap_drops_degenerate_bucket(spark):
    """A constant-color flood (every image identical, all four bands
    over the cap) must generate ZERO candidate pairs, while an
    independent near-dup pair in the same table still pairs — the
    MinHash hot-bucket guard applied to images."""
    from duckdb_age_spark.operators.multimodal import ahash_dup_pairs

    flat = [[128] * 8 for _ in range(8)]
    top_bright = [[200] * 8 for _ in range(4)] + [[10] * 8 for _ in range(4)]
    perturbed = [r[:] for r in top_bright]
    perturbed[7][7] = 255
    rows = [(i, "image/bmp", _bmp_from_gray(flat), "{}") for i in range(10)]
    rows += [
        (100, "image/bmp", _bmp_from_gray(top_bright), "{}"),
        (101, "image/bmp", _bmp_from_gray(perturbed), "{}"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta_json string"
    )
    pairs = {(r.a, r.b) for r in ahash_dup_pairs(media, max_hamming=4, band_cap=5).collect()}
    assert pairs == {(100, 101)}   # the 10-image flood paired nothing


def test_word_ngrams_zip_formulation_matches_slice_join(spark):
    """The r13 zip_with shingling rewrite (5.6x faster at sf10) must emit
    byte-identical n-gram strings to the original transform+slice+array_join
    formulation — the oracle SQL still constructs shingles the literal way,
    so any divergence here becomes a hash mismatch in six dedup oracles.
    Pins the short-row edge cases: < n words yields ONE truncated shingle
    (zip_with null-pads, concat_ws skips nulls)."""
    from pyspark.sql import functions as F

    from duckdb_age_spark.operators.dedup import _word_ngrams

    def slice_join(col, n):
        words = F.split(F.trim(col), r"\s+")
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )

    cases = [
        "", "a", "a b", "a b c", "a b c d",
        "  padded   spaces  x ", "one two three four five six",
        "tab\tand\nnewline mix", "x " * 200,
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["text"])
    for n in (2, 3, 5):
        bad = (
            df.select(
                _word_ngrams(F.col("text"), n).alias("new"),
                slice_join(F.col("text"), n).alias("old"),
            )
            .where(F.col("new") != F.col("old"))
            .count()
        )
        assert bad == 0, f"n={n}: zip formulation diverges from slice+join"
