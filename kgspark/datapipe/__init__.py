"""Large-scale training-data pipeline operators (BASELINE extra scope):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
ANN similarity search, text analysis, multimodal column plumbing."""
