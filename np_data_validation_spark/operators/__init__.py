"""Relational operators of the validation engine (joins, CASE classifier,
constraints, stats, drift, dedup, similarity)."""
