"""Operator library: dedup, similarity, text analysis, multimodal plumbing."""
