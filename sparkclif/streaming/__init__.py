"""Structured Streaming surface (SURVEY.md §2.2 group H) — the Spark
analog of the reference's socket-mode event loop (app.py:637-643)."""
