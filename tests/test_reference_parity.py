"""Ports of the reference's own gtest assertion cases
(/root/reference/test/utils/*.cpp) against our kernels — the reference's
test surface run verbatim on the reimplementation."""

import pytest

from pdftotext_plus_plus_spark.model import Element
from pdftotext_plus_plus_spark.utils.elements import (
    horizontal_gap, overlap_ratios, vertical_gap)
from pdftotext_plus_plus_spark.utils.mathutils import (
    between, equal, equal_or_larger, equal_or_smaller, larger,
    round_half_away, smaller)

TOL = 0.0001


# --- MathUtilsTest (test/utils/MathUtilsTest.cpp:30-137) -------------------

def test_ref_equal():
    assert equal(0.0, 0.0)
    assert equal(2.3, 2.3)
    assert equal(1.1, 1.5, 0.4)
    assert equal(5.3, 5.7, 2.2)
    assert not equal(0.0, 0.1)
    assert not equal(2.3, 5.3)
    assert not equal(1.1, 1.5, 0.39)
    assert not equal(5.3, 7.7, 1.2)


def test_ref_larger():
    assert larger(0.1, 0.0)
    assert larger(3.3, 2.3)
    assert larger(1.8, 1.5, 0.2)
    assert larger(5.3, 1.7, 2.2)
    assert not larger(0.0, 0.0)
    assert not larger(0.3, 2.8)
    assert not larger(1.8, 1.5, 0.3)
    assert not larger(5.3, 1.7, 5.0)


def test_ref_smaller():
    assert smaller(0.0, 0.01)
    assert smaller(3.3, 4.2)
    assert smaller(1.3, 1.8, 0.2)
    assert smaller(5.4, 10.7, 2.2)
    assert not smaller(0.01, 0.0)
    assert not smaller(4.2, 3.3)
    assert not smaller(1.3, 1.8, 0.5)
    assert not smaller(9.1, 10.7, 2.2)


def test_ref_equal_or_larger():
    assert equal_or_larger(1.0, 1.0)
    assert equal_or_larger(3.3, 0.2)
    assert equal_or_larger(1.3, 1.3, 0.2)
    assert equal_or_larger(11.9, 9.0, 2.2)
    assert not equal_or_larger(0.9, 1.0)
    assert not equal_or_larger(0.0, 0.2)
    assert not equal_or_larger(0.9, 1.2, 0.2)
    assert not equal_or_larger(2.1, 11.0, 2.2)


def test_ref_equal_or_smaller():
    assert equal_or_smaller(1.0, 1.0)
    assert equal_or_smaller(0.3, 2.2)
    assert equal_or_smaller(1.3, 1.3, 0.2)
    assert equal_or_smaller(1.2, 1.3, 0.2)
    assert not equal_or_smaller(1.1, 1.0)
    assert not equal_or_smaller(5.1, 0.2)
    assert not equal_or_smaller(1.41, 1.2, 0.2)
    assert not equal_or_smaller(11.0, 2.1, 2.2)


def test_ref_between():
    assert between(0.0, 0.0, 1.0)
    assert between(0.5, 0.0, 1.0)
    assert between(1.7, 1.5, 1.6, 0.1)
    assert between(1.4, 1.5, 1.6, 0.1)
    assert not between(1.1, 0.0, 1.0)
    assert not between(0.2, 0.5, 1.0)
    assert not between(2.0, 1.5, 1.6, 0.2)
    assert not between(0.0, 2.0, 3.0, 1.0)


def test_ref_round():
    assert abs(round_half_away(1.46731, 0) - 1.0) <= TOL
    assert abs(round_half_away(1.56731, 0) - 2.0) <= TOL
    assert abs(round_half_away(1.56731, 1) - 1.6) <= TOL
    assert abs(round_half_away(1.56731, 2) - 1.57) <= TOL
    assert abs(round_half_away(1.56731, 3) - 1.567) <= TOL
    assert abs(round_half_away(1.56731, 4) - 1.5673) <= TOL
    assert abs(round_half_away(1.56731, 5) - 1.56731) <= TOL


# --- PdfElementsUtilsTest (test/utils/PdfElementsUtilsTest.cpp) ------------

def _el(left, upper, right, lower, rotation=0):
    e = Element()
    e.left_x, e.upper_y, e.right_x, e.lower_y = left, upper, right, lower
    e.rotation = rotation
    return e


def test_ref_compute_overlap_ratios():
    # computeOverlapRatios cases (PdfElementsUtilsTest.cpp:80-134 shape):
    assert overlap_ratios(0.0, 0.0, 0.0, 0.0) == (0.0, 0.0)
    assert overlap_ratios(0.0, 10.0, 10.0, 20.0) == (0.0, 0.0)
    r1, r2 = overlap_ratios(0.0, 10.0, 5.0, 15.0)
    assert abs(r1 - 0.5) <= TOL and abs(r2 - 0.5) <= TOL
    r1, r2 = overlap_ratios(0.0, 10.0, 2.0, 7.0)
    assert abs(r1 - 0.5) <= TOL and abs(r2 - 1.0) <= TOL
    # reversed interval endpoints are normalized
    r1, r2 = overlap_ratios(10.0, 0.0, 5.0, 15.0)
    assert abs(r1 - 0.5) <= TOL and abs(r2 - 0.5) <= TOL


def test_ref_horizontal_gap_signs():
    a = _el(0.0, 0.0, 10.0, 10.0)
    b = _el(15.0, 0.0, 25.0, 10.0)
    assert horizontal_gap(a, b) == 5.0
    assert horizontal_gap(b, a) == 5.0
    c = _el(8.0, 0.0, 18.0, 10.0)
    assert horizontal_gap(a, c) == -2.0
    # rotation 2: sign flips (PdfElementsUtils.cpp:54-62)
    a2 = _el(0.0, 0.0, 10.0, 10.0, rotation=2)
    b2 = _el(15.0, 0.0, 25.0, 10.0, rotation=2)
    assert horizontal_gap(a2, b2) == 10.0 - 15.0


def test_ref_vertical_gap_signs():
    a = _el(0.0, 0.0, 10.0, 10.0)
    b = _el(0.0, 14.0, 10.0, 24.0)
    assert vertical_gap(a, b) == 4.0
    c = _el(0.0, 8.0, 10.0, 18.0)
    assert vertical_gap(a, c) == -2.0
