"""Placeholder — populated by the textstats extension build step."""
