"""Driver-style correctness gate, run locally: every query with an oracle
is executed on Spark AND DuckDB at sf0.01 and compared order-insensitively
(row count, sorted column names, rounded values) — mirroring what the
driver records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pytest

import associationabacminer_spark.queries as Q
from associationabacminer_spark.sources.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, cols):
    """Order-insensitive canonical form: sort columns by name, round
    floats, stringify, sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _canon_spark_type(dt: str) -> str:
    """Canonical type kind for cross-engine comparison. Integer widths
    collapse to 'int'; all floats to 'float'; decimals keep precision so a
    DuckDB HUGEINT/DECIMAL result (what an un-cast integer SUM returns)
    fails against a Spark BIGINT — mirroring the driver's value-hash,
    which distinguishes representations (VERDICT.md round 1, q16/q29/q37/q48)."""
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if dt in ("float", "double", "real"):
        return "float"
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("varchar") or dt == "string":
        return "string"
    return dt


def _canon_arrow_type(t) -> str:
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_boolean(t):
        return "boolean"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t):
        return "array"
    return str(t)


ORACLE_QUERIES = sorted(Q.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    sdf = Q.QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    arrow = duck.execute(Q.ORACLES[name]).arrow()
    duck_cols = arrow.column_names
    duck_rows = [tuple(d.values()) for d in arrow.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    spark_types = {c: _canon_spark_type(t) for c, t in sdf.dtypes}
    duck_types = {
        c: _canon_arrow_type(arrow.schema.field(c).type) for c in duck_cols
    }
    assert spark_types == duck_types, (
        f"{name}: type-kind mismatch {spark_types} vs {duck_types} "
        "(driver value-hash distinguishes representations)"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mismatches}"


def test_all_queries_run_and_return_rows(spark):
    """Rows-only smoke for oracle-less (sketch/iterative) queries, and
    self-check flags must all be True."""
    for name, fn in Q.QUERIES.items():
        if name in Q.ORACLES:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert len(rows) >= 0, name
        if "ok" in df.columns:
            assert all(r["ok"] for r in rows), (name, rows)


def test_gate_window_all_oracled_and_aliases_resolve():
    """The driver hash-gates the FIRST 50 queries() keys in dict INSERTION
    order (proven by CORRECTNESS_r03.json); a rows-only entry in that
    window wastes a gated slot.  Assert BOTH insertion-order and
    sorted-order windows are all-oracled AND identical, so the invariant
    is robust to either driver behavior (round-3 VERDICT item 1).
    Also: every legacy alias must resolve."""
    insertion_window = list(Q.QUERIES)[:50]
    sorted_window = sorted(Q.QUERIES)[:50]
    assert insertion_window == sorted_window, (
        "insertion-order and sorted-order gate windows diverge; "
        "the re-pack at the bottom of queries.py must keep them equal"
    )
    not_oracled = [n for n in insertion_window if n not in Q.ORACLES]
    assert not_oracled == [], f"rows-only queries inside the gated window: {not_oracled}"
    # The entry-point dict the driver actually sees must carry the same order.
    import __spark_entry__ as E

    assert list(E.queries())[:50] == insertion_window
    for old, new in Q.ALIASES.items():
        assert new in Q.QUERIES, (old, new)
        assert Q.resolve(old) is Q.QUERIES[new]


def test_gated_caps_actually_drop_hot_shingles(spark):
    """q32/q42 carry the scale-path caps (max_shingle_df=3 / 2) into the
    driver gate.  That only exercises the capped code path if the hot set
    is non-empty on the driver's data — assert it stays that way, so a
    testdata regen can't silently turn the capped queries back into the
    uncapped path."""
    from pyspark.sql import functions as F

    from associationabacminer_spark.functions.text import word_ngrams
    from associationabacminer_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    ex32 = (
        d.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias("sh"),
        )
        .groupBy("sh")
        .count()
        .filter(F.col("count") > 3)
        .count()
    )
    assert ex32 > 0, "q32 cap (df>3) drops nothing at sf0.01 — cap path idle"
    ex42 = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 5))).alias("sh"),
        )
        .distinct()
        .groupBy("sh")
        .count()
        .filter(F.col("count") > 2)
        .count()
    )
    assert ex42 > 0, "q42 cap (df>2) drops nothing at sf0.01 — cap path idle"
