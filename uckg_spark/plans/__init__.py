"""Logical plans: triple emission (§2.9) + the end-to-end KG pipeline."""
