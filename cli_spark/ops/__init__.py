"""Large-scale training-data operators: deduplication, similarity
search, text analysis, multimodal plumbing — the operations a 100 TB
training-data pipeline needs beyond the reference's RDF surface.

- :mod:`cli_spark.ops.dedup`      exact / MinHash-LSH / SimHash / n-gram-Jaccard
- :mod:`cli_spark.ops.simsearch`  brute-force + LSH-bucketed ANN over embeddings
- :mod:`cli_spark.ops.textstats`  language-ID, quality scoring, token counts, fingerprints
- :mod:`cli_spark.ops.multimodal` binary columns with typed metadata; decode stubs
"""
