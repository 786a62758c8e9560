"""Query plans: the engine's query surface, one entry per SURVEY.md §2 row."""
