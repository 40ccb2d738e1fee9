"""Property tests for the batch #14-#17 rollup kernels, run against the
ORACLE SQL in DuckDB on hypothesis-generated corpora (no Spark session:
the Spark side is pinned to the same SQL by the parity gates, so a
property proven of the SQL holds for both engines):

* length_percentiles: the histogram-rollup derivation (smallest value
  whose cumulative count covers p%) equals direct sorted-list indexing
  of the lower quantile, for ANY multiset of lengths — the core
  correctness argument for computing exact percentiles without a sort.
* postings_gap_stats varint math: sum(gaps) == last id + 1 under the
  sentinel -1 convention, and the (bit_length+6)//7 byte count matches
  a reference VByte encoder, for ANY distinct posting set.
* weighted_sample_topk: the integer exponential race is a total,
  deterministic order — the winners are exactly the k smallest
  (arrival, doc_id) pairs, and raising a document's weight never makes
  it lose to a document it previously beat (monotonicity in weight).
"""

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdftotext_plus_plus_spark.datapipe import sampling, textstats


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
                " lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    return con


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["en", "fr", "xx"]),
                          st.integers(min_value=0, max_value=500)),
                min_size=1, max_size=60))
def test_length_percentiles_equals_sorted_indexing(items):
    rows = [(i, "t", lang, "s", n) for i, (lang, n) in enumerate(items)]
    con = _duck(rows)
    got = {r[0]: r for r in
           con.execute(textstats.LENGTH_PERCENTILES_SQL).fetchall()}
    by_lang = {}
    for lang, n in items:
        by_lang.setdefault(lang, []).append(n)
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        # lower quantile by direct indexing: ceil(p*n)-th order statistic
        def q(num, den):
            return vals[(n * num + den - 1) // den - 1]
        _, n_docs, lo, p10, p50, p90, hi = got[lang]
        assert (n_docs, lo, hi) == (n, vals[0], vals[-1])
        assert (p10, p50, p90) == (q(1, 10), q(1, 2), q(9, 10))


def _vbyte_len(g):
    # reference VByte encoder: 7 payload bits per byte, g >= 1
    n = 0
    while True:
        n += 1
        g >>= 7
        if g == 0:
            return n


@settings(max_examples=60, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40),
               min_size=1, max_size=50))
def test_postings_gap_varint_math(ids):
    ids = sorted(ids)
    gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
    assert sum(gaps) == ids[-1] + 1             # sentinel -1 self-check
    for g in gaps:
        assert g >= 1
        # the SQL formula (length(bin(g)) + 6) // 7 == reference VByte
        assert (g.bit_length() + 6) // 7 == _vbyte_len(g)


def _arrival(doc_id, w):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return h // max(w, 1)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(st.integers(min_value=0, max_value=10**6),
                       st.integers(min_value=0, max_value=10**4),
                       min_size=1, max_size=40))
def test_weighted_sample_race_total_and_monotone(weights):
    k = sampling.WEIGHTED_SAMPLE_K
    order = sorted(weights, key=lambda d: (_arrival(d, weights[d]), d))
    winners = order[:k]
    # total order: no ties in the (arrival, doc_id) key by construction
    keys = [(_arrival(d, weights[d]), d) for d in weights]
    assert len(set(keys)) == len(keys)
    # monotonicity: doubling a winner's weight keeps it a winner
    for d in winners:
        boosted = dict(weights)
        boosted[d] = max(1, weights[d]) * 2
        order2 = sorted(boosted,
                        key=lambda x: (_arrival(x, boosted[x]), x))
        assert d in order2[:k]


def test_weighted_sample_oracle_on_duck_corpus():
    """The oracle SQL reproduces the pure-Python race on a crafted
    corpus with zero weights and duplicate weights."""
    rows = [(i, "t", "en", f"src{i % 3}", w)
            for i, w in enumerate([0, 1, 1, 7, 50, 50, 400, 0, 9, 9])]
    con = _duck(rows)
    got = con.execute(sampling.WEIGHTED_SAMPLE_TOPK_SQL).fetchall()
    by_src = {}
    for d, _, _, src, w in rows:
        by_src.setdefault(src, []).append((d, max(w, 1)))
    expect = []
    for src, ds in by_src.items():
        order = sorted(ds, key=lambda t: (_arrival(*t), t[0]))
        for rn, (d, w) in enumerate(order[:sampling.WEIGHTED_SAMPLE_K],
                                    start=1):
            expect.append((src, d, w, _arrival(d, w), rn))
    assert sorted(got) == sorted(expect)
