"""Hypothesis property tests for the round-5 pipeline operators: the
pigeonhole fuzzy-join blocking, the span-corruption mask identity, and
the curriculum composite order key — correctness pins that hold on
ARBITRARY inputs, not just the driver fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------ fuzzy-join blocking

_codes = st.lists(
    st.text(alphabet="01", min_size=9, max_size=9),  # tiny alphabet → collisions
    min_size=0,
    max_size=40,
    unique=True,
)


def _hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


@settings(max_examples=300, deadline=None)
@given(codes=_codes)
def test_pigeonhole_blocking_recall_is_one(codes):
    """Position-partition blocking of join_fuzzy_hamming_ids must
    produce EXACTLY the Hamming-1 pairs the quadratic definition
    gives, for BOTH the interleaved partition the query uses and the
    contiguous half-split: a single mismatch lies in one position set,
    so the pair shares the other set's projection verbatim (recall 1);
    the exact verify removes any same-block pair at distance >1
    (precision 1).  Correctness is partition-independent — only COST
    depends on the choice (query docstring)."""
    from collections import defaultdict

    brute = {
        (min(a, b), max(a, b))
        for i, a in enumerate(codes)
        for b in codes[i + 1 :]
        if _hamming(a, b) == 1
    }
    partitions = [
        ((0, 2, 4, 6, 8), (1, 3, 5, 7)),  # interleaved (0-based, query's choice)
        ((0, 1, 2, 3, 4), (5, 6, 7, 8)),  # contiguous halves
        ((0, 3, 4, 7, 8), (1, 2, 5, 6)),  # mixed (0-based, the ORACLE's choice)
    ]
    for set_a, set_b in partitions:
        buckets = defaultdict(list)
        for c in codes:
            buckets[(0, "".join(c[i] for i in set_a))].append(c)
            buckets[(1, "".join(c[i] for i in set_b))].append(c)
        blocked = set()
        for members in buckets.values():
            for i, a in enumerate(members):
                for b in members[i + 1 :]:
                    pair = (min(a, b), max(a, b))
                    if _hamming(*pair) == 1:
                        blocked.add(pair)
        assert blocked == brute


# -------------------------------------------- span-corruption identity


@settings(max_examples=300, deadline=None)
@given(
    flags=st.lists(st.booleans(), min_size=1, max_size=50),
    span_len=st.integers(min_value=1, max_value=4),
)
def test_masked_or_formula_equals_span_union(flags, span_len):
    """The per-index OR formulation (token i masked iff a span STARTS
    at any of i, i-1, ..., i-span_len+1) must equal the explicit
    span-expansion semantics (union of [s, s+span_len-1] windows,
    overlaps merged, clipped at the document end) — the identity
    augment_span_corruption's single-pass transform relies on."""
    n = len(flags)
    starts = [i for i in range(n) if flags[i]]
    union = set()
    for s in starts:
        union.update(range(s, min(s + span_len, n)))
    or_form = {
        i
        for i in range(n)
        if any(i - d >= 0 and flags[i - d] for d in range(span_len))
    }
    assert or_form == union


# ---------------------------------------- curriculum composite order key


@settings(max_examples=300, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),  # quality
            st.integers(min_value=0, max_value=10_000_000_000 - 1),  # doc_id
        ),
        min_size=0,
        max_size=50,
        unique_by=lambda t: t[1],
    )
)
def test_curriculum_order_key_is_order_isomorphic(items):
    """ord = (2000 - quality)·10^10 + doc_id must sort identically to
    (quality DESC, doc_id ASC) for quality ≤ 2000, doc_id < 10^10 —
    the encoding curriculum_select_budget feeds to the single-key
    prefix_sum.  Also pins that the key stays below 2^53 (exact in a
    double, required by the boundary-sampling percentile probe)."""
    by_tuple = sorted(items, key=lambda t: (-t[0], t[1]))
    by_key = sorted(items, key=lambda t: (2000 - t[0]) * 10_000_000_000 + t[1])
    assert by_tuple == by_key
    for q, d in items:
        assert (2000 - q) * 10_000_000_000 + d < 2**53
