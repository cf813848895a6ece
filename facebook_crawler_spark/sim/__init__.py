"""Single-node reference simulator (SURVEY.md §5.1): a pure-Python
re-statement of the reference crawler's loop semantics, used as the golden
oracle the distributed engine must match exactly."""
