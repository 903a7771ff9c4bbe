"""Scalar function library (SURVEY.md §2.7) — all JVM-side Column expressions."""
