"""Cross-engine parity of the data-adaptive blocking-cap formulas.

The dedup family's hot-token cap default is computed in Python on the
Spark side (`token_df_cap`) and as a scalar subquery inside the DuckDB
oracle (`TOKEN_DF_CAP_SQL`). Both reduce to GREATEST(64,
CEIL(4*SQRT(n))) — IEEE sqrt is correctly rounded and *4 is an exact
power-of-two scaling, so the two must agree bit-for-bit at ANY corpus
size. This pins that claim over 12 orders of magnitude so a future
formula edit that breaks parity (e.g. a multiplier that isn't a power
of two applied before the sqrt) fails here, not in the gate.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stream_ingestion_amazon_kinesis_spark.operators.dedup import (
    _LSH_BUCKET_CAP_ENV,
    _TOKEN_DF_CAP_ENV,
    lsh_bucket_cap,
    token_df_cap,
)

_con = duckdb.connect()


@pytest.mark.skipif(
    bool(_TOKEN_DF_CAP_ENV), reason="env override pins the cap; formula unused"
)
@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=10**12))
def test_token_df_cap_matches_oracle_formula(n):
    sql = _con.execute(
        f"SELECT GREATEST(64, CAST(CEIL(4 * SQRT({n})) AS BIGINT))"
    ).fetchone()[0]
    assert token_df_cap(n) == sql


@pytest.mark.skipif(
    bool(_LSH_BUCKET_CAP_ENV), reason="env override pins the cap; formula unused"
)
@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**12))
def test_lsh_bucket_cap_monotone_and_bounded(n):
    cap = lsh_bucket_cap(n)
    assert cap >= 64
    # k^2/2 pair emission under the cap stays ~2N: cap = ceil(2*sqrt(n))
    # so cap^2 <= 4n + 4*sqrt(n) + 1 (plus the 64 floor for tiny n)
    assert cap * cap <= max(4 * n + 4 * math.isqrt(n) + 1, 64 * 64)


def test_cap_values_at_fixture_sizes():
    # The documented defaults at the shipped fixture sizes (and sf1).
    assert token_df_cap(500) == 90
    assert token_df_cap(5000) == 283
    assert token_df_cap(50000) == 895
    assert lsh_bucket_cap(5000) == 142


def test_oracle_env_override_guard(monkeypatch):
    """ADVICE r9: an engine-only env override (the static oracle derives
    the same parameter adaptively and cannot see it) must fail FAST with
    a clear message instead of surfacing as a confusing value mismatch
    at gate time — unless the experimenter explicitly acknowledges.

    ADVICE r10: the guard judges the IMPORT-TIME captured value the
    operator actually uses (passed by the caller), not a live
    os.environ read — a var set after import must not raise (the engine
    still runs the oracle-synced default) and a var unset after import
    must still raise (the override is active)."""
    from stream_ingestion_amazon_kinesis_spark.plans.registry import (
        guard_oracle_env_override,
    )

    monkeypatch.delenv("SPARK_GRAFT_UNSAFE_ENV_OVERRIDES", raising=False)
    # no frozen override -> no-op, even if the var is set NOW (the
    # operator module captured None at import and still runs defaults)
    monkeypatch.setenv("SPARK_GRAFT_IVF_CELLS", "128")
    guard_oracle_env_override("ann_ivf_topk", "SPARK_GRAFT_IVF_CELLS", None)
    # frozen override -> loud failure naming the query, the var, and
    # the opt-out — even if the var was unset after import
    monkeypatch.delenv("SPARK_GRAFT_IVF_CELLS", raising=False)
    with pytest.raises(RuntimeError, match="SPARK_GRAFT_IVF_CELLS"):
        guard_oracle_env_override(
            "ann_ivf_topk", "SPARK_GRAFT_IVF_CELLS", "128"
        )
    # explicit acknowledgment -> allowed (perf experiments)
    monkeypatch.setenv("SPARK_GRAFT_UNSAFE_ENV_OVERRIDES", "1")
    guard_oracle_env_override("ann_ivf_topk", "SPARK_GRAFT_IVF_CELLS", "128")
