"""Spark operators: extraction, mentions, linking, canonicalization,
dedup, similarity, text stats, multimodal plumbing, skew helpers."""
