"""Structured Streaming operators for the events table (SURVEY.md §7.5).

The reference has no data streaming (its heartbeats are control-plane
liveness only — worker.py:31-37); this package adds the streaming surface
a modern pipeline expects: watermarked tumbling/sliding window aggregates
and file-source → sink wiring, each with a batch-equivalent used for the
correctness oracle.
"""
