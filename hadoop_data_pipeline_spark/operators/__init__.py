"""Operator library (SURVEY.md §2): relational building blocks the
reference codifies, plus the large-scale training-data extensions."""
