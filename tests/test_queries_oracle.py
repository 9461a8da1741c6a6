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


ORACLE_QUERIES = sorted(Q.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    sdf = Q.QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(Q.ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
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
