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


def test_readme_registry_counts_match():
    """README's 'N registered queries; M hash-checked' line must track
    the live registry — ADVICE r5 flagged a drift (counts bumped in one
    commit, queries added in a later one)."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parents[1].joinpath("README.md").read_text()
    m = re.search(r"(\d+) registered queries; (\d+) hash-checked", text)
    assert m, "README registry-count line missing"
    n_total = len(REGISTRY)
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (n_total, n_oracle), (
        f"README says {m.group(1)}/{m.group(2)}, registry has "
        f"{n_total}/{n_oracle} — update README.md"
    )
