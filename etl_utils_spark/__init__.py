"""etl_utils_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-imagining of the capabilities of exasol/etl-utils
(reference: /root/reference/query_wrapper.sql — an Exasol Lua ETL job
harness) as an idiomatic PySpark engine:

- ``wrapper``    : the QueryWrapper job harness (params, logging, on_error,
                   transactions, prepared statements) — reference Tier A.
- ``queries``    : the declared relational/LLM-pipeline query library
                   (SURVEY.md §2 Tier B/C) — pure DataFrame/Catalyst plans.
- ``sources``    : parquet table catalog over the driver fixtures.
- ``operators``  : reusable large-scale operators (dedup, similarity,
                   sessionization, text analysis, multimodal).
- ``streaming``  : Structured Streaming variants of the event operators.

Everything is DataFrame-first: no RDDs, no driver-side loops in any
hot path; Catalyst plans all physical execution.
"""

__version__ = "0.1.0"
