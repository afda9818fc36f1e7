"""Text-analysis catalog queries (beyond-reference tier). Filled by the
text operator milestone."""
