"""Registry-wide ``count()`` smoke: the driver's bench forces execution
with ``df.count()``, a DIFFERENT plan shape than ``collect()`` —
count prunes every unused column, and BENCH_r02 was voided by a
cogrouped-map UDF that only crashed under that pruning while every
collect-based check stayed green. The oracle-parity suite covers the
collect action; this covers the bench action for every registered
query, so a pruning-only breakage can never reach the driver unseen.
"""

from __future__ import annotations

from etl_utils_spark.queries import REGISTRY


def test_every_registered_query_survives_count(spark, sf_dir):
    failures = []
    for name, q in sorted(REGISTRY.items()):
        try:
            q.fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 - aggregate all breakages
            failures.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
    assert not failures, failures
