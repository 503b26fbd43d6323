"""Structured Streaming formulations of the reference's hand-rolled
incremental semantics (SURVEY.md 2.9)."""
