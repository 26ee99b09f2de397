"""Placeholder — populated by the similarity extension build step."""
