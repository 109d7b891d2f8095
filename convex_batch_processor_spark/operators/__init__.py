"""Relational operators (SURVEY.md §2) as composable DataFrame functions."""
