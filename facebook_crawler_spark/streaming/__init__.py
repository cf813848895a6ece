"""Micro-batch crawl rounds: frontier scheduling, politeness, seen-set,
checkpointed round runner (SURVEY.md §2.8, M4-M7)."""
