"""Scalar-function library.

Almost everything the reference computes per-row in Python (reference
parsers/*, utils/regex_search.py) compiles here to built-in Catalyst
expressions (SURVEY.md §2.6). The only UDF surfaces in the engine are
Arrow-vectorized: URL canonicalization batches, HTML extraction batches,
and the image codec (SURVEY.md §2.7).
"""
