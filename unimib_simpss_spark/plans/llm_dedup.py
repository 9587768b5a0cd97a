"""Deduplication queries (exact, MinHash, SimHash, n-gram Jaccard). Filled
in with the LLM-ops milestone."""
