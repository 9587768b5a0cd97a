"""Text-analysis queries (lang-id, quality, tokens, fingerprints). Filled
in with the LLM-ops milestone."""
