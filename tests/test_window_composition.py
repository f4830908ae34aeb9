"""The driver's correctness gate hashes the FIRST 50 registry entries,
so the window's composition is part of the driver contract: every slot
must be oracle-backed (a rows-only entry would burn a verification slot
on a weaker rows-only check), and _WINDOW must stay duplicate-free (a
duplicate silently shrinks the set of queries the round verifies)."""

from __future__ import annotations

import etl_utils_spark.queries as q
from etl_utils_spark.queries import _WINDOW

# the external gate samples this many registry-prefix entries per round
DRIVER_WINDOW = 50


def test_window_has_no_duplicates():
    assert len(_WINDOW) == len(set(_WINDOW)), [
        n for n in set(_WINDOW) if _WINDOW.count(n) > 1
    ]


def test_first_50_registry_entries_are_oracle_backed():
    assert len(_WINDOW) >= DRIVER_WINDOW, (
        f"_WINDOW ({len(_WINDOW)}) no longer covers the {DRIVER_WINDOW}-entry driver gate"
    )
    first = list(q.REGISTRY)[:DRIVER_WINDOW]
    rows_only = [n for n in first if q.REGISTRY[n].oracle is None]
    assert not rows_only, f"rows-only queries occupy driver window slots: {rows_only}"


def test_window_is_registry_prefix():
    # _reorder() puts _WINDOW first; if that invariant breaks, the
    # staged rotation order silently stops being what the driver sees.
    names = list(q.REGISTRY)
    assert names[: len(_WINDOW)] == _WINDOW


def test_rows_only_sorted_last():
    # rows-only queries must sit at the registry tail, after every
    # oracle-backed query — the driver samples from the front.
    names = list(q.REGISTRY)
    kinds = [q.REGISTRY[n].oracle is None for n in names]
    first_rows_only = kinds.index(True) if True in kinds else len(names)
    assert all(kinds[first_rows_only:]), "oracle-backed query after a rows-only one"
