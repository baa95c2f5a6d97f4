"""Readers/writers for the engine's table formats (SURVEY.md §2.1)."""
