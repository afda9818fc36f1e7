"""Similarity-search catalog queries (beyond-reference tier). Filled by
the similarity operator milestone."""
