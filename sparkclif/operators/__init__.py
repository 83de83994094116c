"""Custom operators built ON Spark (not in it) — SURVEY.md §4.2:
as-of join, dedup family, similarity search, text analysis."""
