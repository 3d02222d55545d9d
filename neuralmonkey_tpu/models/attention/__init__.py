"""Attention mechanisms (reference nm/attention/)."""
