"""Structured Streaming adapters (the reference is batch-only —
SURVEY.md §2.9 — these cover incremental ingest for the KG pipeline)."""
