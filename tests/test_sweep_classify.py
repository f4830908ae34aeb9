"""Unit tests for scripts/sf1_sweep.py's classify(): the 10×→bounded-3×
control flow must NEVER abort the sweep — every failure shape in the
bounded retry records a FAIL for that one query (VERDICT r9 item 5:
the pre-r10 inline flow could propagate a non-timeout exception out of
the retry handler and kill the whole round-close gate)."""

import importlib.util
import os

import duckdb
import pytest

_SWEEP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "sf1_sweep.py",
)
_spec = importlib.util.spec_from_file_location("sf1_sweep_under_test", _SWEEP)
sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sweep)


def test_pass_at_10x():
    status, msg = sweep.classify(lambda sf, b: (True, "ok"), timeout=1)
    assert (status, msg) == ("pass", "ok")


def test_compare_mismatch_is_fail():
    status, msg = sweep.classify(lambda sf, b: (False, "hash mismatch"), timeout=1)
    assert status == "fail" and "hash mismatch" in msg


def test_timeout_then_bounded_pass():
    calls = []

    def run(sf, budget):
        calls.append((sf, budget))
        if len(calls) == 1:
            raise sweep._Timeout()
        return True, "ok@3x"

    status, _ = sweep.classify(run, timeout=7, sf10="ten", sf3="three")
    assert status == "bounded"
    # the retry hits the bounded dir with the doubled budget
    assert calls == [("ten", 7), ("three", 14)]


def test_timeout_at_both_scales():
    def run(sf, budget):
        raise sweep._Timeout()

    status, msg = sweep.classify(run, timeout=1)
    assert (status, msg) == ("fail", "timeout at 10x AND 3x")


@pytest.mark.parametrize(
    "exc",
    [
        duckdb.BinderException("Referenced column X not found"),
        FileNotFoundError("/tmp/sparkgraft_sf03 missing"),
        RuntimeError("boom"),
    ],
)
def test_nontimeout_error_in_bounded_retry_records_fail(exc):
    """The VERDICT r9 hole: a DuckDB error (or missing 3× dir) inside
    the retry must classify as FAIL for this query, not propagate."""

    def run(sf, budget):
        if sf.endswith("sf1") or sf == "ten":
            raise sweep._Timeout()
        raise exc

    status, msg = sweep.classify(run, timeout=1, sf10="ten", sf3="three")
    assert status == "fail"
    assert msg.startswith("3x retry")
    assert type(exc).__name__ in msg


def test_nontimeout_error_at_10x_records_fail():
    def run(sf, budget):
        raise duckdb.InvalidInputException("bad parquet")

    status, msg = sweep.classify(run, timeout=1)
    assert status == "fail" and "InvalidInputException" in msg
