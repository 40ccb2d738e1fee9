"""Property tests for the exactness guarantees the scale-path dedup
algorithms rely on (pure-Python mirrors of the Spark formulas):

* PPJoin prefix filtering: under ANY common total order of shingles, two
  sets with Jaccard >= t share at least one shingle in their prefixes of
  length ``n - ceil(t*n) + 1`` — so prefix-join candidate generation
  misses no qualifying pair (datapipe/dedup.ngram_jaccard_pairs).
* Pigeonhole simhash banding: a pair within Hamming distance 3 over 64
  bits agrees exactly on >= 1 of the 4 16-bit bands
  (datapipe/dedup.simhash_near_pairs).
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

THRESHOLD = 0.8


def _prefix(sorted_set, t):
    n = len(sorted_set)
    return set(sorted_set[: n - math.ceil(t * n) + 1])


@settings(max_examples=300)
@given(st.sets(st.integers(0, 60), min_size=1, max_size=25),
       st.sets(st.integers(0, 60), min_size=1, max_size=25),
       st.permutations(list(range(61))))
def test_prefix_filter_complete(a, b, order):
    """J(a,b) >= t  =>  prefixes intersect (for any total order)."""
    inter = len(a & b)
    union = len(a | b)
    if inter / union < THRESHOLD:
        return
    key = {v: i for i, v in enumerate(order)}
    pa = _prefix(sorted(a, key=key.__getitem__), THRESHOLD)
    pb = _prefix(sorted(b, key=key.__getitem__), THRESHOLD)
    assert pa & pb, (a, b)


@settings(max_examples=300)
@given(st.integers(0, 2**64 - 1),
       st.sets(st.integers(0, 63), min_size=0, max_size=3))
def test_pigeonhole_banding_complete(sig, flip_bits):
    """hamming(x, y) <= 3 over 64 bits => x and y share a 16-bit band."""
    other = sig
    for b in flip_bits:
        other ^= 1 << b
    shares = any(((sig >> (16 * band)) & 0xFFFF)
                 == ((other >> (16 * band)) & 0xFFFF)
                 for band in range(4))
    assert shares


@settings(max_examples=100)
@given(st.integers(-(2**63), 2**63 - 1))
def test_band_keys_match_signed_arithmetic_shift(sig):
    """The engines store the simhash as a SIGNED 64-bit value and extract
    band keys with an arithmetic >> plus a 16-bit mask; the keys must equal
    the unsigned-representation bands (so banding exactness carries over)."""
    unsigned = sig & (2**64 - 1)
    for band in range(4):
        # arithmetic shift on the signed value, as Spark/DuckDB compute it
        arith = (sig >> (16 * band)) & 0xFFFF
        assert arith == ((unsigned >> (16 * band)) & 0xFFFF)


@settings(max_examples=200)
@given(st.sets(st.integers(0, 60), min_size=1, max_size=25),
       st.sets(st.integers(0, 60), min_size=1, max_size=25))
def test_size_filter_sound(a, b):
    """J(a,b) >= t  =>  t*|a| <= |b| and t*|b| <= |a| (the candidate-join
    size filter never prunes a qualifying pair)."""
    inter = len(a & b)
    union = len(a | b)
    if inter / union < THRESHOLD:
        return
    assert len(b) >= math.ceil(THRESHOLD * len(a))
    assert len(a) >= math.ceil(THRESHOLD * len(b))
