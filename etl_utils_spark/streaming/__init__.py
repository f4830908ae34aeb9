"""Structured Streaming variants of the event operators (SURVEY.md §2
C10a-C10e): tumbling/sliding/session windows, watermarks, stateful
stream dedup — built on readStream over the same event schema the
batch operators use, so every streaming query has a batch oracle.
"""
