"""Composed end-to-end pipelines (the reference's main.py orchestration)."""
