"""Unit tests for tolerance math — mirrors the reference's gtest surface
(/root/reference/test/utils/MathUtilsTest.cpp)."""

from pdftotext_plus_plus_spark.utils.mathutils import (
    between, equal, equal_or_larger, equal_or_smaller, larger,
    round_half_away, smaller)


def test_equal():
    assert equal(1.0, 1.0)
    assert equal(1.0, 1.00005)
    assert not equal(1.0, 1.2)
    assert equal(1.0, 1.2, 0.3)
    assert equal(-1.0, -1.2, 0.3)


def test_larger_asymmetric():
    # larger(a, b, tol) == a > b + tol — not a symmetric epsilon test
    assert larger(2.0, 1.0)
    assert not larger(1.1, 1.0, 0.1)
    assert larger(1.11, 1.0, 0.1)
    assert not larger(1.0, 1.0)


def test_smaller_asymmetric():
    assert smaller(1.0, 2.0)
    assert not smaller(0.9, 1.0, 0.1)
    assert smaller(0.89, 1.0, 0.1)


def test_equal_or_larger_smaller():
    assert equal_or_larger(1.0, 1.0)
    assert equal_or_larger(0.99995, 1.0)
    assert not equal_or_larger(0.9, 1.0)
    assert equal_or_smaller(1.0, 1.0)
    assert equal_or_smaller(1.00005, 1.0)
    assert not equal_or_smaller(1.1, 1.0)


def test_between():
    assert between(1.5, 1.0, 2.0)
    assert between(1.0, 1.0, 2.0)
    assert between(2.0, 1.0, 2.0)
    assert not between(2.2, 1.0, 2.0)
    assert between(2.1, 1.0, 2.0, 0.15)


def test_round_half_away_from_zero():
    # Python's builtin round() is banker's rounding; ours must not be.
    assert round_half_away(0.5) == 1.0
    assert round_half_away(1.5) == 2.0
    assert round_half_away(2.5) == 3.0
    assert round_half_away(-0.5) == -1.0
    assert round_half_away(-2.5) == -3.0
    assert round_half_away(2.25, 1) == 2.3
    assert round_half_away(2.249, 2) == 2.25
    assert round_half_away(7.124999, 1) == 7.1
