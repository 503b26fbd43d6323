"""Operator library (SURVEY.md section 2) — pure DataFrame->DataFrame
functions, each independently oracle-testable."""
