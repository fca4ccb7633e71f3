"""DataFrame-level operators: signatures, LSH, dedup, clustering,
similarity search, text analysis, multimodal plumbing."""
