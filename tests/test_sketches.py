"""Accuracy contracts for the mergeable-sketch aggregates (G6).

The HLL and count-min queries are rows-only under the oracle gate (the
DataSketches/CMS binary forms are engine-specific), so their error
bounds are pinned here against exact twins computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.operators.sketches import (
    cms_orderpriority_frequencies,
    hll_monthly_merge_customers,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_hll_monthly_merge_within_5pct_of_exact(spark, sf_dir):
    exact = (
        load_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()[0]
        .d
    )
    row = hll_monthly_merge_customers(spark, sf_dir).collect()[0]
    assert abs(row.distinct_customers_est - exact) / exact <= 0.05
    assert row.n_months > 1  # the merge stage actually merged sketches


def test_hll_merge_equals_single_pass_sketch(spark, sf_dir):
    """Merging per-month sketches must give the same estimate as
    sketching the whole column in one pass — the property that makes
    incremental rollups trustworthy."""
    orders = load_table(spark, sf_dir, "orders")
    single = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", 12)).alias("est")
    ).collect()[0].est
    merged = hll_monthly_merge_customers(spark, sf_dir).collect()[0]
    assert merged.distinct_customers_est == single


def test_cms_estimates_bounded_above_exact(spark, sf_dir):
    """CMS guarantee: exact <= estimate <= exact + eps * N (w.p. 0.99)."""
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    row = cms_orderpriority_frequencies(spark, sf_dir).collect()[0]
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytearray(row.priority_sketch)
    )
    eps = 0.001
    assert sketch.totalCount() == row.n_rows
    for prio, n in exact.items():
        est = sketch.estimateCount(prio)
        assert n <= est <= n + eps * row.n_rows, f"{prio}: exact={n} est={est}"


def test_hll_intersection_accuracy(spark, sf_dir):
    """Inclusion-exclusion retained-user estimate stays within an HLL
    error band of the exact week-over-week intersection (lgK=12 ->
    ~1.6% relative standard error per estimate; three estimates
    compound, so the band is 8% of the union, floored at 5 absolute
    for small fixtures)."""
    from stream_ingestion_amazon_kinesis_spark.operators.sketches import (
        hll_retention_intersection,
    )

    events = load_table(spark, sf_dir, "events")
    pdf = (
        events.select(F.date_trunc("week", "ts").alias("week"), "user_id")
        .distinct()
        .toPandas()
    )
    by_week = {w: set(g.user_id) for w, g in pdf.groupby("week")}
    got = hll_retention_intersection(spark, sf_dir).collect()
    assert got, "no week pairs"
    for r in got:
        a, b = by_week[r.week], by_week[r.next_week]
        exact = len(a & b)
        union = len(a | b)
        band = max(5.0, 0.08 * union)
        assert abs(r.est_retained - exact) <= band, (
            f"{r.week}: est={r.est_retained} exact={exact} band={band}"
        )


def test_hll_custom_exact_error_band(spark, sf_dir):
    """The custom exact-oracle HLL (m=64) must land inside ~2x its
    theoretical stderr (1.04/sqrt(64) = 13%) on every group INCLUDING
    the register-max-merged ALL rollup — and the merged estimate must
    come from merged registers, not a re-scan (n_registers_set <= m)."""
    from stream_ingestion_amazon_kinesis_spark.operators.sketches import (
        HLL_M,
        hll_custom_exact_distinct,
    )

    rows = hll_custom_exact_distinct(spark, sf_dir).collect()
    grps = {r["grp"] for r in rows}
    assert "ALL" in grps and len(grps) >= 3
    for r in rows:
        assert r["n_registers_set"] <= HLL_M
        assert r["error_ppm"] <= 260_000, (
            f"{r['grp']}: HLL error {r['error_ppm']} ppm exceeds the "
            f"2x-stderr band (est {r['hll_estimate']} vs exact "
            f"{r['exact_distinct']})"
        )


def test_cms_custom_exact_error_band(spark, sf_dir):
    """CMS one-sided error: never underestimates, and the top-10 words'
    overestimate stays under the e/w * total-mass bound (with the
    min-over-4-rows giving big slack in practice)."""
    from stream_ingestion_amazon_kinesis_spark.operators.sketches import (
        CMS_W,
        cms_custom_exact_frequencies,
    )

    rows = cms_custom_exact_frequencies(spark, sf_dir).collect()
    assert len(rows) == 10
    total = None
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], r
        assert r["overestimate_ppm"] >= 0
    # generous absolute bound: a single row's expected collision mass is
    # total/w; the min over 4 rows should be well under 3x that
    import math

    from stream_ingestion_amazon_kinesis_spark.operators.text_analysis import (
        bpe_word_seqs,
    )

    total = (
        bpe_word_seqs(spark, sf_dir)
        .agg({"cnt": "sum"})
        .collect()[0][0]
    )
    bound = 3 * total / CMS_W
    for r in rows:
        assert r["cms_estimate"] - r["exact_count"] <= bound, (r, bound)


def test_kmv_custom_exact_error_band(spark, sf_dir):
    """The custom exact-oracle KMV sketch (k=64) must land inside ~2.5x
    its theoretical stderr (1/sqrt(k-2) ~ 12.7%) on every DISTINCT
    estimate, the union ('ALL') sketch included; the theta-algebra
    intersection gets a looser band (its variance compounds the union
    estimate's), plus structural invariants: sketches never exceed k
    values and theta is the sketch maximum by construction."""
    from stream_ingestion_amazon_kinesis_spark.operators.sketches import (
        KMV_K,
        kmv_distinct_setops,
    )

    rows = kmv_distinct_setops(spark, sf_dir).collect()
    grps = {r["grp"] for r in rows}
    assert "ALL" in grps and any(g.startswith("INTERSECT(") for g in grps)
    for r in rows:
        assert r["n_sketch"] <= KMV_K
        if r["grp"].startswith("INTERSECT("):
            # match-fraction estimator: k=64 band ~ 2.5/sqrt(n_match)
            exact, est = r["exact_distinct"], r["kmv_estimate"]
            band = max(5.0, 0.6 * exact)
            assert abs(est - exact) <= band, (
                f"{r['grp']}: est={est} exact={exact} band={band}"
            )
        else:
            assert r["error_ppm"] <= 320_000, (
                f"{r['grp']}: KMV error {r['error_ppm']} ppm exceeds the "
                f"2.5x-stderr band (est {r['kmv_estimate']} vs exact "
                f"{r['exact_distinct']})"
            )


def test_bloom_membership_no_false_negatives_and_sane_fpr(spark, sf_dir):
    """Bloom invariants: every true member is bloom-positive (zero
    false negatives — the filter's defining guarantee), the bit count
    never exceeds m, and at fixture scale the false-positive rate stays
    far from saturation (n*d << m here)."""
    from stream_ingestion_amazon_kinesis_spark.operators.sketches import (
        BLOOM_M,
        bloom_membership_audit,
    )

    rows = bloom_membership_audit(spark, sf_dir).collect()
    assert len(rows) >= 3  # market segments
    for r in rows:
        assert r["bloom_positives"] >= r["true_members"], r
        assert (
            r["false_positives"]
            == r["bloom_positives"] - r["true_members"]
        ), r
        assert r["n_bits_set"] <= BLOOM_M
        assert r["fpr_ppm"] <= 500_000, r
