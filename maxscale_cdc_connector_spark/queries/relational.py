"""Relational-layer queries (SURVEY.md §2B) — filled in Phase 2."""
