"""Composed pipelines (the reference's notebook entry points as
parameterized functions)."""
