"""Scalar / vectorized function surface (hashing, text analysis, arrays)."""
