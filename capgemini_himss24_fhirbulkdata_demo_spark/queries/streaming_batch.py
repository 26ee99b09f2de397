"""Placeholder — populated by the streaming_batch extension build step."""
