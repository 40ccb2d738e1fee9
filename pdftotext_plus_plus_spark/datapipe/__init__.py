"""Large-scale training-data-pipeline operators over the synthetic
``documents`` / ``embeddings`` tables.

Beyond the reference's own operators, these are the ops a 100 TB web-corpus
pipeline needs: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language-ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Every SQL-expressible op is written twice with *identical cross-engine
semantics*: a Spark DataFrame implementation and a DuckDB oracle.  The only
primitives used on both sides are md5 (identical hex), substr (1-based),
lexicographic string min, and integer arithmetic — no engine-specific hash
functions, so value-hash comparisons are exact.
"""
