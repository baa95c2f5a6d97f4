"""Pipeline layer: memoized incremental-batch stages (SURVEY.md §3)."""
