"""Relational + pipeline operators (SURVEY.md §2.2-§2.5, plus the
training-data pipeline operators: dedup, similarity, text, multimodal)."""
