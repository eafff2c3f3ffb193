"""Training-data pipeline operators over the documents/embeddings tables:
deduplication (exact, MinHash+LSH, SimHash), similarity search (brute-force
cosine top-k, LSH-bucketed ANN), text analysis (token counting, quality
scoring, language id, fingerprinting), multimodal column plumbing.

All built on Spark DataFrame ops (JVM-side expressions) wherever possible;
numpy-vectorized Arrow UDFs only where built-ins can't express the op.
"""
