"""The bitwise oracle compare (scripts/check_exact.py, dress_rehearsal
--bitwise) must be strictly tighter than the default 9-sig-digit
compare: ulp-level float drift and -0.0/+0.0 must FAIL bitwise while
passing the loose compare — that exact gap shipped the round-5 red."""

from __future__ import annotations

import datetime as dt
import math
import struct
from decimal import Decimal

from tests.oracle import _norm, _norm_exact


def test_ulp_drift_distinct_bitwise_but_equal_loose():
    a = 0.1 + 0.2            # 0.30000000000000004
    b = 0.3
    assert _norm(a) == _norm(b)          # 9 sig digits: equal
    assert _norm_exact(a) != _norm_exact(b)  # bitwise: distinct


def test_negative_zero_distinct_bitwise():
    assert _norm(-0.0) == _norm(0.0)
    assert _norm_exact(-0.0) != _norm_exact(0.0)


def test_equal_bits_compare_equal():
    v = math.sqrt(2.0)
    assert _norm_exact(v) == _norm_exact(struct.unpack("<d", struct.pack("<d", v))[0])
    assert _norm_exact(float("nan")) == _norm_exact(float("nan"))


def test_integral_decimal_merges_with_int():
    # DuckDB HUGEINT arrives as Python int, Spark decimal(38,0) as
    # Decimal — equal integral values must normalize identically.
    assert _norm_exact(Decimal("5")) == _norm_exact(5)
    assert _norm_exact(Decimal("5.00")) == _norm_exact(5)
    assert _norm_exact(Decimal("5.50")) == _norm_exact(Decimal("5.50"))
    assert _norm_exact(Decimal("5.50")) != _norm_exact(Decimal("5.25"))


def test_type_tags_do_not_collide():
    # int 1 vs True vs 1.0 are distinct lanes; strings pass through.
    assert _norm_exact(1) != _norm_exact(True)
    assert _norm_exact(1) != _norm_exact(1.0)
    assert _norm_exact("x") == "x"
    assert _norm_exact(None) is None


def test_temporal_and_binary_lanes():
    t = dt.datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=dt.timezone.utc)
    assert _norm_exact(t) == _norm_exact(dt.datetime(2024, 1, 2, 3, 4, 5, 123456))
    assert _norm_exact(dt.date(2024, 1, 2)) != _norm_exact(dt.datetime(2024, 1, 2))
    assert _norm_exact(b"\x00\xff") == _norm_exact(bytearray(b"\x00\xff"))
    assert _norm_exact([0.5, None]) == (_norm_exact(0.5), None)


def test_stream_digest_order_independent_and_sensitive():
    """Digest mode (large-result compare path) must ignore row order,
    count duplicate rows (sum, not xor), and catch 1-ulp drift."""
    from tests.oracle import _stream_digest

    rows = [(1, 0.1 + 0.2), (2, 0.5), (2, 0.5)]
    cols = ["a", "b"]
    n1, d1 = _stream_digest(iter(rows), cols, _norm_exact)
    n2, d2 = _stream_digest(iter(reversed(rows)), cols, _norm_exact)
    assert (n1, d1) == (n2, d2)  # order-independent
    # duplicate-pair cancellation would make these equal under xor
    _, d3 = _stream_digest(iter(rows[:1]), cols, _norm_exact)
    assert d3 != d1
    # 1-ulp drift must change the digest under the bitwise norm
    _, d4 = _stream_digest(iter([(1, 0.3), (2, 0.5), (2, 0.5)]), cols, _norm_exact)
    assert d4 != d1
    # column-order normalization: reordered column NAMES with matching
    # values digest equal (the full compare sorts columns by name too)
    _, d5 = _stream_digest(
        iter([(0.1 + 0.2, 1), (0.5, 2), (0.5, 2)]), ["b", "a"], _norm_exact
    )
    assert d5 == d1
