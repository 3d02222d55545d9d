"""Series readers (reference nm/readers/, SURVEY.md §3.1)."""
