"""Placeholder module — filled in by the dedup milestone."""
