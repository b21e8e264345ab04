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
