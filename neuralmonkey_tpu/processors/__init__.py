"""Pre/post-processors (reference nm/processors/, SURVEY.md §3.1)."""
