"""Reusable large-scale operators: dedup, similarity search, text
analysis, sessionization/as-of joins, multimodal plumbing.

These are the north-star LLM-data-pipeline operators (SURVEY.md §2
Tier C8-C10): library functions over DataFrames — no planner hooks,
everything Catalyst-optimizable.
"""
