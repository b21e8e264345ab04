"""Every registered query matches its DuckDB oracle at sf0.001.

This is the same comparison the driver harness runs at sf0.01
(row count + sorted column names + order-insensitive exact values).
"""

from __future__ import annotations

import duckdb
import pytest

from stream_ingestion_amazon_kinesis_spark import TABLES
from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all

from scripts.check_oracle import df_to_rows

_load_all()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    odf = oracle.execute(spec.oracle).fetchdf()
    scols, srows = df_to_rows(sdf)
    ocols, orows = df_to_rows(odf)
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} rows differ; first: {mismatches[0]}"


def test_approx_count_distinct_tolerance(spark, sf_dir, oracle):
    """HLL++ at rsd=0.01 must land within ±5% of the exact distinct
    count (the driver records approx_distinct_lineitem rows-only; this
    is its hard accuracy signal)."""
    from stream_ingestion_amazon_kinesis_spark.operators.relational import (
        approx_distinct_lineitem,
    )

    row = approx_distinct_lineitem(spark, sf_dir).collect()[0]
    exact_parts, exact_orders = oracle.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    assert abs(row["approx_parts"] - exact_parts) / exact_parts <= 0.05
    assert abs(row["approx_orders"] - exact_orders) / exact_orders <= 0.05


def test_rows_only_queries_name_their_hard_signal():
    """Every rows-only registry entry (oracle=None) must point at the
    pytest node that carries its accuracy/recall/determinism signal,
    and that node must actually exist (file + function)."""
    import ast
    import os

    _load_all()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, spec in QUERIES.items():
        if spec.oracle is not None:
            continue
        assert spec.twin_test, f"{name} is rows-only but has no twin_test"
        path, _, func = spec.twin_test.partition("::")
        full = os.path.join(repo, path)
        assert os.path.exists(full), f"{name}: twin file {path} missing"
        tree = ast.parse(open(full).read())
        funcs = {
            n.name for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
        }
        assert func in funcs, f"{name}: {func} not found in {path}"
