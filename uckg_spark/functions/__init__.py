"""Scalar-function helpers shared across plans."""
