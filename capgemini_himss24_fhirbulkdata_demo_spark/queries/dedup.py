"""Placeholder — populated by the dedup extension build step."""
