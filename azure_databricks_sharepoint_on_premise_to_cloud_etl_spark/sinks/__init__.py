"""Sink operators (SURVEY.md section 2.2, K1-K6)."""
