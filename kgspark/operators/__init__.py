"""Operator layer: extraction (E*), dedup (D*), temporal (T*), community (C*) — SURVEY §2."""
