"""Filled in by module-specific build step."""
