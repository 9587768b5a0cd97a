"""Similarity-search queries (cosine top-k, IVF/LSH). Filled in with the
LLM-ops milestone."""
