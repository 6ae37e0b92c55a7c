"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's per-document scope (SURVEY.md §2 rows 41-44
territory): deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force + LSH-
bucketed ANN), text analysis (language-ID, quality, tokens,
fingerprints, repetition gates, PII scan), corpus curation
(benchmark decontamination, deterministic stratified sampling,
mixture rebalancing, token-shard packing, per-stratum top-k,
corpus-frequency boilerplate removal, repeated-n-gram hotspots), and
multimodal binary-column plumbing.

Everything uses engine-portable primitives (md5-based hashing, list
lambdas) so each operator has an exact DuckDB oracle twin.
"""
