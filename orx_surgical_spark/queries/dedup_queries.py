"""Deduplication catalog queries (beyond-reference tier). Filled by the
dedup operator milestone."""
