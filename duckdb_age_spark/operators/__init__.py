"""Large-scale data-pipeline operators (SURVEY.md §2c) — all Spark-first:
built-in pyspark.sql.functions (JVM-side, whole-stage-codegen) wherever the
semantics allow, Arrow-batched pandas UDFs only where they don't.

Modules:
    text        — token counting, quality scoring, language-ID, fingerprints
    dedup       — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine
    similarity  — brute-force + LSH-bucketed top-k ANN over embeddings
    events      — windowed aggregation, sessionization, JSON props
    relational  — TPC-H-style host-engine queries (joins/aggs/windows)
    multimodal  — opaque-binary column plumbing with stubbed decoders
"""
