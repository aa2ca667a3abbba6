"""LLM-data-pipeline queries (SURVEY.md §2B extension) — filled in Phase 4."""
