"""Source operators (SURVEY.md section 2.1, S1-S9)."""
