"""Geometry kernels — mirrors /root/reference/test/utils/PdfElementsUtilsTest.cpp."""

from pdftotext_plus_plus_spark.model import Element
from pdftotext_plus_plus_spark.utils.elements import (
    horizontal_gap, max_x_overlap_ratio, max_y_overlap_ratio, overlap_ratios,
    vertical_gap, x_overlap_ratios, y_overlap_ratios)


def el(left, upper, right, lower, rotation=0):
    e = Element()
    e.left_x, e.upper_y, e.right_x, e.lower_y = left, upper, right, lower
    e.rotation = rotation
    return e


def test_horizontal_gap():
    a = el(10, 0, 20, 10)
    b = el(25, 0, 35, 10)
    assert horizontal_gap(a, b) == 5.0
    assert horizontal_gap(b, a) == 5.0  # picks leftmost internally
    c = el(18, 0, 30, 10)
    assert horizontal_gap(a, c) == -2.0  # overlap -> negative gap


def test_horizontal_gap_rotated():
    a = el(10, 0, 20, 10, rotation=2)
    b = el(25, 0, 35, 10, rotation=2)
    # for rotation 2/3 the sign flips (PdfElementsUtils.cpp:54-62)
    assert horizontal_gap(a, b) == 20 - 25


def test_vertical_gap():
    a = el(0, 10, 10, 20)
    b = el(0, 24, 10, 34)
    assert vertical_gap(a, b) == 4.0
    assert vertical_gap(b, a) == 4.0


def test_overlap_ratios():
    assert overlap_ratios(0, 10, 5, 15) == (0.5, 0.5)
    assert overlap_ratios(0, 10, 20, 30) == (0.0, 0.0)
    assert overlap_ratios(0, 10, 0, 10) == (1.0, 1.0)
    r1, r2 = overlap_ratios(0, 10, 2, 7)
    assert r1 == 0.5 and r2 == 1.0
    # degenerate zero-length interval
    assert overlap_ratios(5, 5, 0, 10) == (0.0, 0.5 * 0)


def test_xy_overlap_ratios():
    a = el(0, 0, 10, 10)
    b = el(5, 5, 15, 15)
    assert x_overlap_ratios(a, b) == (0.5, 0.5)
    assert y_overlap_ratios(a, b) == (0.5, 0.5)
    assert max_x_overlap_ratio(a, b) == 0.5
    c = el(2, 0, 7, 10)
    assert max_x_overlap_ratio(a, c) == 1.0
    assert max_y_overlap_ratio(a, c) == 1.0
