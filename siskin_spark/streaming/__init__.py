"""Structured Streaming tail (SURVEY.md §2.10: optional executor for
the harvest->bronze path; semantics stay incremental batch)."""
