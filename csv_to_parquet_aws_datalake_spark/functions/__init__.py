"""Reusable column-expression builders (vectors, text) — all JVM-side."""
