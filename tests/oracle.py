"""Local replica of the driver's t2 correctness gate.

Runs a registered query's Spark DataFrame and its DuckDB oracle SQL on
the same parquet fixtures and compares row count, sorted column names,
and order-insensitive values (floats compared to 9 significant digits,
timestamps normalized to naive datetimes).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import struct
from decimal import Decimal

import duckdb

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        # the driver fixtures are single files; derived scale-up dirs
        # (scripts/scale_probe.py) are directory-style parquet — DuckDB
        # binds the view's glob at CREATE VIEW time, so pick the form
        # that exists
        p = f"{sf_dir}/{t}.parquet"
        pat = p if os.path.isfile(p) else f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    return con


# --------------------------------------------------------------- type parity
# The driver's value-hash is TYPE-sensitive in ways the value compare
# below is not: DuckDB SUM(int) yields HUGEINT (Arrow decimal128(38,0))
# which hashes differently from Spark's bigint even when every value is
# equal (r1 `sessionize_events` red row).  Empirically (r1 green rows)
# int WIDTH does not matter (Spark int vs DuckDB BIGINT hashed equal,
# `string_funcs_part`), nor does timestamp unit — but decimal-vs-int,
# decimal-vs-float, and date-vs-timestamp do.  We therefore compare
# type FAMILIES: int | float32 | float64 | decimal(p,s) | string |
# date | timestamp | bool | binary | list<fam> | struct | map.

_DUCK_INTS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def duck_type_family(t: str):
    t = t.strip()
    u = t.upper()
    if u.endswith("[]"):
        return ("list", duck_type_family(t[:-2]))
    if u.startswith("DECIMAL"):
        inner = u[u.index("(") + 1 : u.index(")")] if "(" in u else "38,0"
        p, s = (int(x) for x in inner.split(","))
        return ("decimal", p, s)
    if u in ("HUGEINT", "UHUGEINT"):
        return ("decimal", 38, 0)
    if u in _DUCK_INTS:
        return "int"
    if u == "DOUBLE":
        return "float64"
    if u in ("FLOAT", "REAL"):
        return "float32"
    if u in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u == "DATE":
        return "date"
    if u == "BOOLEAN":
        return "bool"
    if u == "BLOB":
        return "binary"
    if u.startswith("STRUCT"):
        return "struct"
    if u.startswith("MAP"):
        return "map"
    return u


_SPARK_INTS = {"tinyint", "smallint", "int", "bigint"}


def spark_type_family(t: str):
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return ("list", spark_type_family(t[6:-1]))
    if t.startswith("decimal"):
        inner = t[t.index("(") + 1 : t.index(")")] if "(" in t else "10,0"
        p, s = (int(x) for x in inner.split(","))
        return ("decimal", p, s)
    if t in _SPARK_INTS:
        return "int"
    if t == "double":
        return "float64"
    if t == "float":
        return "float32"
    if t == "string":
        return "string"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t == "boolean":
        return "bool"
    if t == "binary":
        return "binary"
    if t.startswith("struct"):
        return "struct"
    if t.startswith("map"):
        return "map"
    return t


def compare_types(spark, sf_dir: str, name: str):
    """Plan-only type-family parity: Spark schema (lazy, no execution)
    vs DuckDB DESCRIBE of the oracle (plans, does not run).  Returns
    (ok, message); rows-only queries pass vacuously."""
    from etl_utils_spark.queries import REGISTRY

    q = REGISTRY[name]
    if q.oracle is None:
        return (True, "rows-only")
    sdf = q.fn(spark, sf_dir)
    # The driver's pandas canonicalizer cannot hash array/map/struct
    # cells (the r2 array_advanced_ops / r4 map_funcs_events reds) —
    # every oracle-backed query must emit scalars only (array_join
    # nested values to CSV on both sides; docs/SCALE.md).
    nested = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.simpleString().startswith(("array", "map", "struct"))
    ]
    if nested:
        return (False, f"nested output columns {nested} crash the driver canonicalizer")
    s_types = {f.name: spark_type_family(f.dataType.simpleString()) for f in sdf.schema.fields}

    con = duckdb_connect(sf_dir)
    try:
        desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
    finally:
        con.close()
    d_types = {row[0]: duck_type_family(row[1]) for row in desc}

    if set(s_types) != set(d_types):
        return (False, f"column mismatch: spark={sorted(s_types)} duckdb={sorted(d_types)}")
    bad = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]
    }
    if bad:
        return (False, f"type-family mismatch: {bad}")
    return (True, "types ok")


def _norm_exact(v):
    """Bitwise normalization — the driver-hash-equivalent strictness.

    ``_norm`` below rounds floats to 9 significant digits, which is
    LOOSER than the driver's value hash (the round-5 red shipped
    through exactly that gap: two doubles equal at 9 sig digits but
    differing in the last ulp hash differently).  This variant packs
    doubles to their IEEE-754 bytes, so two values compare equal here
    only if the driver's canonicalizer sees identical bits.  -0.0 and
    +0.0 are deliberately distinct (the driver distinguishes them; the
    documented DuckDB fix is appending ``+ 0.0`` on the oracle side).
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        # DuckDB fetches HUGEINT as Python int but DECIMAL as Decimal;
        # Spark always yields Decimal for decimal columns.  Integral
        # decimals therefore merge with the int lane; fractional ones
        # compare by VALUE (trailing zeros stripped via normalize()) so
        # a scale-only difference — Decimal('5.50') vs Decimal('5.5') —
        # is reported by compare_types as a type-parity issue, not
        # surfaced here as a confusing value mismatch.
        if v == v.to_integral_value():
            return ("i", int(v))
        return ("dec", format(v.normalize(), "f"))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", struct.pack("<d", v).hex())
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_exact(x) for x in v)
    return v


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # 9 significant digits — tolerates engine-level float formatting
        # differences while catching real numeric drift.
        return float(f"{v:.9g}")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _normalize_rows(rows, colnames, norm=None):
    norm = norm or _norm
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(norm(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


# Past this many oracle rows the full compare switches to a streaming
# order-independent digest: materializing + python-sorting 6M
# normalized tuples per side blew the sf1 sweep's watchdog on
# math_funcs_lineitem while BOTH engines ran the query itself in <5s.
# Digest mode trades the first-mismatching-row diagnostic (fixture-
# scale runs keep it) for O(chunk) memory and no global sort.  Both
# sides stream with the SAME value rendering as the full compare
# (DuckDB fetchmany == fetchall typing, Spark toLocalIterator ==
# collect typing), so digest mode changes cost, never semantics.
_DIGEST_THRESHOLD = int(os.environ.get("SPARK_GRAFT_COMPARE_DIGEST_ROWS", "500000"))
_FETCH_CHUNK = 65536


def _duck_row_iter(res, first=()):
    """Stream python-typed rows from a DuckDB result via fetchmany
    (identical value rendering to fetchall), after replaying any rows
    already pulled for the mode decision."""
    yield from first
    while True:
        chunk = res.fetchmany(_FETCH_CHUNK)
        if not chunk:
            return
        yield from chunk


def _stream_digest(row_iter, colnames, norm):
    """Order-independent digest over normalized rows: sum of per-row
    sha1 prefixes mod 2^128 (sum, not xor — xor cancels duplicate row
    PAIRS).  Normalization is byte-for-byte the one the full compare
    uses, so digest mode has the same strictness, just no row diff."""
    import hashlib

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    total = 0
    n = 0
    for row in row_iter:
        t = tuple(norm(row[i]) for i in order)
        h = hashlib.sha1(repr(t).encode()).digest()[:16]
        total = (total + int.from_bytes(h, "little")) % (1 << 128)
        n += 1
    return n, total


def compare_query(
    spark, sf_dir: str, name: str, bitwise: bool = False,
    duck_budget: float | None = None,
):
    """Return (ok, message) for one registered query vs its oracle.

    ``bitwise=True`` switches the float compare from 9-significant-digit
    rounding to exact IEEE-754 bit equality — the strictness level of the
    driver's value hash.  Use it for every new oracle-backed query before
    declaring it window-ready (scripts/check_exact.py wraps this).

    Results larger than ``_DIGEST_THRESHOLD`` rows compare by
    order-independent streaming digest: DuckDB rows via ``fetchmany``
    (identical Python typing to ``fetchall``) and Spark rows via
    ``toLocalIterator`` (identical typing to ``collect``) — NOT Arrow,
    whose ``to_pylist`` renders maps/HUGEINT differently than the
    row-based paths the small compare uses.

    ``duck_budget`` (seconds) arms a watchdog thread that calls
    ``con.interrupt()`` — the only cancellation DuckDB honors promptly;
    a SIGALRM-raised exception can sit unserviced for minutes inside a
    single pipeline (measured on the quadratic Hamming-join oracle).
    On expiry the oracle raises duckdb.InterruptException."""
    from etl_utils_spark.queries import REGISTRY

    norm = _norm_exact if bitwise else _norm
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = list(sdf.columns)

    if q.oracle is None:
        # collect, not count: column pruning under count() would skip
        # the computed projections entirely, and the sweep's ANSI
        # overflow certification needs every expression to execute.
        n = len(sdf.collect())
        return (n >= 0, f"rows-only: {n} rows")

    con = duckdb_connect(sf_dir)
    timer = None
    if duck_budget:
        import threading

        timer = threading.Timer(duck_budget, con.interrupt)
        timer.daemon = True
        timer.start()
    try:
        # ONE oracle execution: stream rows out via fetchmany, deciding
        # small-vs-digest by how many arrive (a count(*) probe would
        # run the whole oracle twice and halve the effective watchdog
        # on exactly the expensive queries).
        res = con.execute(q.oracle)
        d_cols = [d[0] for d in res.description]
        if sorted(s_cols) != sorted(d_cols):
            return (
                False,
                f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}",
            )
        head: list = []
        while len(head) <= _DIGEST_THRESHOLD:
            chunk = res.fetchmany(_FETCH_CHUNK)
            if not chunk:
                break
            head.extend(chunk)
        if len(head) > _DIGEST_THRESHOLD:
            # digest mode — stream both sides with the same value
            # rendering the full compare uses, count while digesting,
            # compare counts first (order-independent sums only match
            # trivially when counts do).
            dn_n, dn_d = _stream_digest(_duck_row_iter(res, head), d_cols, norm)
            sp_rows = (
                tuple(r) for r in sdf.toLocalIterator(prefetchPartitions=True)
            )
            sn_n, sn_d = _stream_digest(sp_rows, s_cols, norm)
            if sn_n != dn_n:
                return (False, f"rowcount mismatch: spark={sn_n} duckdb={dn_n}")
            if sn_d != dn_d:
                return (
                    False,
                    f"digest mismatch over {sn_n} rows"
                    f"{' (bitwise)' if bitwise else ''}",
                )
            return (
                True,
                f"ok: {sn_n} rows (digest{', bitwise' if bitwise else ''})",
            )
        d_rows = head
    finally:
        if timer is not None:
            timer.cancel()
        con.close()

    # Bound the spark-side collect by the oracle count: if spark emits
    # even one row more, that is already a rowcount-mismatch FAIL, and
    # an unbounded collect of a runaway spark result would misreport a
    # real mismatch as a harness timeout.
    s_rows = [tuple(r) for r in sdf.limit(len(d_rows) + 1).collect()]
    if len(s_rows) != len(d_rows):
        more = "+" if len(s_rows) > len(d_rows) else ""
        return (
            False,
            f"rowcount mismatch: spark={len(s_rows)}{more} duckdb={len(d_rows)}",
        )

    sn = _normalize_rows(s_rows, s_cols, norm)
    dn = _normalize_rows(d_rows, d_cols, norm)
    if sn != dn:
        diff_i = next(i for i, (a, b) in enumerate(zip(sn, dn)) if a != b)
        return (
            False,
            "value mismatch at sorted row %d%s:\n  spark : %r\n  duckdb: %r"
            % (diff_i, " (bitwise)" if bitwise else "", sn[diff_i], dn[diff_i]),
        )
    return (True, f"ok: {len(s_rows)} rows{' (bitwise)' if bitwise else ''}")
