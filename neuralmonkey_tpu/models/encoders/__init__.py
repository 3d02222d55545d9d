"""Encoders (reference nm/encoders/)."""
