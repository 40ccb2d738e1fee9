"""Counter semantics — mirrors /root/reference/test/utils/CounterTest.cpp plus
the deterministic tie-break from SURVEY.md §7.1.2."""

import pytest

from pdftotext_plus_plus_spark.utils.counter import ModeCounter, most_freq


def test_most_freq_basic():
    c = ModeCounter()
    for v in [1.0, 2.0, 2.0, 3.0]:
        c.inc(v)
    assert c.most_freq() == 2.0
    assert c.most_freq_count() == 2
    assert c.sum_counts() == 4


def test_most_freq_tie_break_smallest():
    c = ModeCounter()
    for v in [3.0, 1.0, 3.0, 1.0]:
        c.inc(v)
    assert c.most_freq() == 1.0  # deterministic: smallest value wins ties


def test_string_counter():
    c = ModeCounter()
    for v in ["b", "a", "b"]:
        c.inc(v)
    assert c.most_freq() == "b"
    c.inc("a")
    assert c.most_freq() == "a"  # tie -> lexicographically smallest


def test_max():
    c = ModeCounter()
    for v in [1.0, 5.0, 3.0]:
        c.inc(v)
    assert c.max() == 5.0


def test_empty_raises():
    c = ModeCounter()
    with pytest.raises(ValueError):
        c.most_freq()
    with pytest.raises(ValueError):
        c.max()


def test_most_freq_helper():
    assert most_freq([10.0, 12.0, 10.0]) == 10.0
    assert most_freq([], default=0.0) == 0.0
