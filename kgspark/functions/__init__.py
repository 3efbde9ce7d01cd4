"""Scalar function layer: text, dates, embeddings (SURVEY §2.7 string/date/math rows)."""
