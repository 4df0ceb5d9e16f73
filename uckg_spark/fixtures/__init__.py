"""Deterministic (seed=42) synthetic fixtures per FIXTURES.md.

All data here is INVENTED — vendors, products, technique names, CVE numbers
are fake. Shapes mirror the reference collectors' output shapes (citations
in each generator). No wall-clock, no network, no randomness beyond
``random.Random(42)``.
"""
