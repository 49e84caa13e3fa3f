"""Relational + data-pipeline operators (SURVEY.md §2.5-§2.8 and extensions)."""
