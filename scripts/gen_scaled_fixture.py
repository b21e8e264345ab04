"""Generate a larger-SF fixture by replicating a driver fixture with
key offsets (sf1 = 10x sf0.1), preserving schema, FK consistency, and
value distributions.

The driver only ships sf{0.001,0.01,0.1}; every 10x step so far has
exposed a new cross-engine divergence class (round 4: DECIMAL->DOUBLE
ULP past 2^53, join->window watermark retention; round 3: int64 ppm
overflows), so the round-6 brief asks for an sf1 value gate. /root/
testdata is read-only -- output goes to a caller-chosen dir (default
/tmp/sfgen/sf1) and is NOT committed.

Replication rule (replica r of R):
  - every dense 0-based surrogate key k becomes k + r*N (N = base
    table row count), so FKs stay consistent replica-local;
  - Customer#/Supplier# names are re-derived from the new key (they
    embed it);
  - all other value columns are copied verbatim -- distributions per
    key are identical to the base fixture, total volume is R x.
Timestamps are written as naive TIMESTAMP (parquet MICROS,
isAdjustedToUTC=false); sources.catalog.load_table normalizes that
shape and DuckDB reads it natively, so both gate engines agree.

Per-table multipliers (round-8 corpus-heavy decade): the uniform R
scales lineitem-heavy; the LLM-pipeline north star is CORPUS scale,
where only documents/embeddings grow. `table_replicas` overrides R for
named tables (they have self-contained id spaces — doc_id/vec_id FK
into nothing — so mixed multipliers stay consistent).

Usage: python scripts/gen_scaled_fixture.py [src_dir] [dst_dir] [R]
           [table=R,table=R,...]
e.g. corpus-heavy: python scripts/gen_scaled_fixture.py \
           /root/testdata/sf0.1 /tmp/sfgen/docs10 1 \
           documents=10,embeddings=10
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> (key columns to offset by r * <base rows of keyed table>)
# Offsets reference the BASE table's row count so FK edges line up:
# orders.o_custkey shifts by |customer| per replica, etc.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": None},  # user_id: see below
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ("region", "nation")
NAME_COLS = {  # name columns that embed the surrogate key
    "customer": ("c_name", "Customer#"),
    "supplier": ("s_name", "Supplier#"),
}


def generate(
    src: str,
    dst: str,
    replicas: int,
    table_replicas: dict[str, int] | None = None,
) -> None:
    table_replicas = table_replicas or {}
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    counts: dict[str, int] = {}
    tables = list(COPY_AS_IS) + list(KEYED)
    for t in tables:
        counts[t] = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
    # user_id is NOT a customer FK (events is its own id space); offset
    # by its own distinct-range span so per-user session structure is
    # preserved per replica.
    user_span = (
        con.execute(
            f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
        ).fetchone()[0]
        or 0
    )

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied {counts[t]} rows")

    for t, keycols in KEYED.items():
        base_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        exprs = []
        for c in base_cols:
            if c in keycols:
                span = user_span if keycols[c] is None else counts[keycols[c]]
                expr = f"{c} + r.r * {span}"
                if t in NAME_COLS:
                    pass  # name handled below
                exprs.append(f"CAST({expr} AS BIGINT) AS {c}")
            elif t in NAME_COLS and c == NAME_COLS[t][0]:
                keyc = next(iter(keycols))
                span = counts[keycols[keyc]]
                prefix = NAME_COLS[t][1]
                exprs.append(
                    f"printf('{prefix}%09d', {keyc} + r.r * {span}) AS {c}"
                )
            else:
                exprs.append(c)
        t_reps = table_replicas.get(t, replicas)
        sql = (
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({t_reps})) AS r) AS r "
            f"ORDER BY r.r) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        con.execute(sql)
        print(f"{t}: {counts[t]} -> {counts[t] * t_reps} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfgen/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    overrides = {}
    if len(sys.argv) > 4:
        for pair in sys.argv[4].split(","):
            t, r = pair.split("=")
            overrides[t.strip()] = int(r)
    generate(src, dst, reps, overrides)
