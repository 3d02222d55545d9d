"""Decoders (reference nm/decoders/)."""
