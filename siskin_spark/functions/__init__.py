"""Column-level function surface (SURVEY.md §2.9 scalar ops plus the
beyond-reference text/similarity families)."""
