"""Batch/stream parity (SURVEY.md §5.2 layer 4): the streaming
last-wins upsert must produce exactly the batch keep-newest dedup
(f_distinct) over the same events."""

from __future__ import annotations

from sparkclif.registry import all_queries


def test_stream_upsert_matches_batch_dedup(spark, sf_dir):
    qs = all_queries()
    stream_rows = {
        (r.user_id, r.event_type): (r.kept_event_id, r.kept_value)
        for r in qs["h_stream_upsert"].fn(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.user_id, r.event_type): (r.kept_event_id, r.kept_value)
        for r in qs["f_distinct"].fn(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_stateful_sessions_match_batch_session_window(spark, sf_dir):
    """applyInPandasWithState sessionizer == batch session_window
    (h_session), row for row."""
    qs = all_queries()
    stream_rows = sorted(
        tuple(r) for r in qs["h_stateful_sessions"].fn(spark, sf_dir).collect()
    )
    batch_rows = sorted(tuple(r) for r in qs["h_session"].fn(spark, sf_dir).collect())
    assert stream_rows == batch_rows
