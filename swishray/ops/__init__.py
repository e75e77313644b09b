"""Large-scale table operators beyond the reference's own inventory:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), text analysis (lang-id, quality, token counts,
fingerprints), similarity search (brute-force + IVF), and multimodal
column plumbing — the operations a web-scale training-data pipeline
needs (task brief), each expressed Ray-Data-first."""
