"""Property-based proof of the log-free BM25 integer reduction.

`_bm25_scores` claims that with k1 = 6/5, b = 3/4 and the rational idf
(N - df + 1/2)/(df + 1/2), the per-term BM25 score

    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

reduces exactly to

    score_ppm = floor(1e6 * (2N-2df+1) * 22*S*tf
                      / ((2df+1) * (10*S*tf + 3*S + 9*dl*N)))

(avgdl = S/N).  The DuckDB oracle validates ENGINE parity, but both
engines run the same reduced formula — this test validates the
REDUCTION itself against the textbook form evaluated in exact
`fractions.Fraction` arithmetic on hypothesis-random corpora, where
boundary shapes (df == N, tf == dl, single-token docs, query terms
absent everywhere) come up in a way the fixtures never produce.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_ingestion_amazon_kinesis_spark.operators.text_analysis import (
    BM25_QUERY_TERMS,
    _bm25_scores,
)

VOCAB = list(BM25_QUERY_TERMS) + ["table", "row", "scan"]

corpus = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12),
    min_size=1,
    max_size=10,
)


def _reference_scores(docs):
    """Textbook BM25 with rational idf, in exact Fraction arithmetic."""
    k1, b = Fraction(6, 5), Fraction(3, 4)
    n = len(docs)
    s = sum(len(d) for d in docs)
    avgdl = Fraction(s, n)
    df = {
        t: sum(1 for d in docs if t in d)
        for t in BM25_QUERY_TERMS
    }
    out = {}
    for doc_id, d in enumerate(docs):
        total = 0
        for t in BM25_QUERY_TERMS:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = Fraction(2 * n - 2 * df[t] + 1, 2 * df[t] + 1)
            score = (
                idf
                * (tf * (k1 + 1))
                / (tf + k1 * (1 - b + b * Fraction(len(d)) / avgdl))
            )
            total += int(1_000_000 * score)  # int() of Fraction == floor (>=0)
        if total or any(t in d for t in BM25_QUERY_TERMS):
            out[doc_id] = total
    return out


def test_decimal_div_exact_at_magnitudes_that_broke_double_guess(spark):
    """Round-7 regression: term_ppm is now `num div den` on DECIMAL(38,0).

    The previous double-based guess +/-1 correction silently
    under-corrected once the true quotient passed ~2^53/3 (advisor
    reproduced off-by-355 at q ~ 1.4e18 — reachable by BM25's rare-term
    quotient ~1.5e6*N near N ~ 2e9 docs). Pin that Spark's integral
    `div` on DECIMAL(38,0) operands is exact at exactly those
    magnitudes, including quotients just around 2^53 and ~1.4e18.
    """
    import random

    rng = random.Random(7)
    cases = []
    for q in (2**53 - 1, 2**53, 2**53 + 1, 14 * 10**17, 9 * 10**18):
        for _ in range(4):
            den = rng.randint(10**3, 10**19)
            num = q * den + rng.randint(0, den - 1)
            if num < 10**38:
                cases.append((str(num), str(den), num // den))
    for _ in range(20):  # random huge operands
        num = rng.randint(10**20, 10**37)
        den = rng.randint(10**4, num)
        cases.append((str(num), str(den), num // den))
    df = spark.createDataFrame(
        [(n, d) for n, d, _ in cases], "num string, den string"
    )
    got = df.selectExpr(
        "CAST(num AS DECIMAL(38,0)) div CAST(den AS DECIMAL(38,0)) AS q"
    ).collect()
    assert [r["q"] for r in got] == [w for _, _, w in cases]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_bm25_integer_reduction_matches_fraction_reference(spark, docs):
    sdf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25_ppm"] for r in _bm25_scores(sdf).collect()}
    assert got == _reference_scores(docs)
