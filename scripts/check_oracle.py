"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle twin on the
same parquet fixtures, then compares row count, column names, and
values (rows sorted, columns sorted by name — order-insensitive, exact
equality; floats must match bit-for-bit, which the engine guarantees
via exact decimal aggregation + deterministic double derivations).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Set CHECK_ORACLE_VANILLA=1 to run under a BARE
`SparkSession.builder.getOrCreate()` (no engine confs) — exactly the
session the verification driver uses. The engine must pass the full
gate under both sessions; the vanilla run is the strong form of
tests/test_vanilla_session.py.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_ingestion_amazon_kinesis_spark import TABLES
from stream_ingestion_amazon_kinesis_spark.plans.registry import (
    QUERIES,
    _load_all,
    release_cached,
)
from stream_ingestion_amazon_kinesis_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def df_to_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _load_all()

    vanilla = bool(os.environ.get("CHECK_ORACLE_VANILLA"))

    if vanilla and not only:
        # Full vanilla sweep: run in JVM generations of 32 queries.
        # In-process session recycling (spark.stop + getOrCreate) is NOT
        # enough — JVM-global state that survives a context stop
        # (codegen/class caches, gateway-pinned objects) accumulated
        # over ~256 heavyweight queries still OOMs a default 1 GiB heap
        # on the next array-heavy query, while the identical 61-query
        # window passes in a fresh JVM. 64-query generations proved
        # borderline (the array-heavy triangle query OOMed as the 61st
        # query of a fresh generation in one run and passed in another —
        # GC timing decides at 1 GiB); 32 keeps clear headroom. Each
        # generation is still a long-lived bare session; per-query
        # semantics are unchanged.
        import subprocess

        names = sorted(QUERIES)
        rc = 0
        for i in range(0, len(names), 32):
            chunk = names[i : i + 32]
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, *chunk]
            )
            rc |= r.returncode
        print(f"\nvanilla sweep: {len(names)} queries in "
              f"{(len(names) + 31) // 32} JVM generations, "
              f"{'FAILURES above' if rc else 'all generations clean'}")
        return rc

    def _make_session():
        if not vanilla:
            return get_spark("oracle-check")
        from pyspark.sql import SparkSession

        return (
            SparkSession.builder.master("local[32]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.enabled", "false")
            # UI-only setting (progress bars corrupt line-oriented
            # output); does not alter query semantics, so the session
            # stays representative of the driver's.
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )

    spark = _make_session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        import time

        # Drop the previous query's localCheckpoint blocks / cache
        # entries before timing the next one — without this a bare
        # 1 GiB driver OOMs ~316 queries into the sf0.1 gate on
        # accumulated block-manager residue (see release_cached).
        release_cached(spark)
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            twin = f", hard signal: {spec.twin_test}" if spec.twin_test else ""
            print(
                f"ok*   {name}: rows-only ({len(sdf)} rows, "
                f"{time.time()-t0:.1f}s{twin})"
            )
            if len(sdf) == 0:
                print(f"      WARNING: 0 rows from {name}")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        scols, srows = df_to_rows(sdf)
        ocols, orows = df_to_rows(odf)
        def _dt(s):
            # datetime64 resolution (ns from Spark, us from DuckDB) is a
            # pandas artifact, not a type the driver's hash distinguishes
            d = str(s.dtype)
            return "datetime64" if d.startswith("datetime64") else d

        sdt = [_dt(sdf[c]) for c in scols] if scols == ocols else []
        odt = [_dt(odf[c]) for c in ocols] if scols == ocols else []
        if scols == ocols and sdt != odt:
            # The driver's value hash is type-sensitive: DuckDB HUGEINT /
            # float where Spark yields int64 hashes differently even when
            # values are equal. Surface it here before the driver does.
            failures.append(name)
            print(f"FAIL  {name}: dtypes differ")
            for c, a, b in zip(scols, sdt, odt):
                if a != b:
                    print(f"  {c}: spark={a} oracle={b}")
            continue
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: columns differ\n  spark:  {scols}\n  oracle: {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: row count {len(srows)} vs {len(orows)}")
            continue
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ]
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: {len(bad)}/{len(srows)} rows differ; first:")
            i, a, b = bad[0]
            print(f"  cols:   {scols}")
            print(f"  spark:  {a}")
            print(f"  oracle: {b}")
        else:
            print(f"ok    {name}: {len(srows)} rows match exactly ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
