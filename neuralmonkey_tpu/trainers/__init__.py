"""Trainers: objectives -> losses -> optimizer updates
(reference nm/trainers/, SURVEY.md §2 L4)."""
