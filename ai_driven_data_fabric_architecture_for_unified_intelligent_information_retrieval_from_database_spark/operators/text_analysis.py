"""Placeholder module — filled in by the text analysis milestone."""
