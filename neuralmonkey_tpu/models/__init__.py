"""Model families: encoders, decoders, attention (SURVEY.md §2 L3)."""
