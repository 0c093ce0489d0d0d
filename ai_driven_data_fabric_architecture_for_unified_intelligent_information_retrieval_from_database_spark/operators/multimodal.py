"""Placeholder module — filled in by the multimodal milestone."""
