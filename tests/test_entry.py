"""Driver-contract smoke: entry() runs and returns a non-empty,
stable-schema DataFrame; queries()/oracle_sql() are consistent."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["run_id", "msg_time", "msg_type", "message", "rowcount"]
    # one MY_LOG line per fixture table + the segment-count step
    my = [r for r in rows if r.msg_type == "MY_LOG"]
    assert len(my) == 11
    # the run() dispatch step logged its revenue lines
    assert sum(1 for r in rows if r.msg_type == "REVENUE") == 3


def test_contract_consistency():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
