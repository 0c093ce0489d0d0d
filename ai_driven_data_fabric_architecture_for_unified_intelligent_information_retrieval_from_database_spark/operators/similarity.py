"""Placeholder module — filled in by the similarity milestone."""
