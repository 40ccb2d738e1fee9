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


# --- TextBlocksDetectionUtilsTest scenario ports (logic level) --------------
# The reference's cases run on a fixture PDF; the scenario shapes are ported
# onto hand-built lines (test/utils/TextBlocksDetectionUtilsTest.cpp:72-110).

def _line(left, right, upper=100.0, lower=107.0, text="x", words=None):
    from pdftotext_plus_plus_spark.model import Line, Word

    line = Line()
    line.left_x, line.right_x = left, right
    line.upper_y, line.lower_y = upper, lower
    line.text = text
    if words:
        ws = []
        for wl, wr in words:
            w = Word()
            w.left_x, w.right_x = wl, wr
            w.upper_y, w.lower_y = upper, lower
            ws.append(w)
        line.words = ws
    return line


def _detector(avg_char_width=5.0):
    from pdftotext_plus_plus_spark.config import DEFAULT_CONFIG
    from pdftotext_plus_plus_spark.kernel.blocks import _BlocksDetector
    from pdftotext_plus_plus_spark.model import Doc

    doc = Doc()
    doc.avg_char_width = avg_char_width
    return _BlocksDetector(doc, DEFAULT_CONFIG)


def test_ref_compute_is_centered_scenarios():
    det = _detector()
    wide = _line(50.0, 250.0)
    disjoint = _line(260.0, 400.0)
    partial = _line(200.0, 350.0)
    nested_skewed = _line(60.0, 120.0)     # offsets 10 vs 130: not equal
    nested_centered = _line(100.0, 200.0)  # offsets 50 vs 50: equal

    # no horizontal overlap -> False
    assert not det._is_centered_pair(wide, disjoint)
    # partial overlap (< 0.99 max ratio) -> False
    assert not det._is_centered_pair(wide, partial)
    # nested but |leftOff| != |rightOff| -> False
    assert not det._is_centered_pair(wide, nested_skewed)
    # identical line -> True; nested with equal offsets -> True (both ways)
    assert det._is_centered_pair(wide, wide)
    assert det._is_centered_pair(wide, nested_centered)
    assert det._is_centered_pair(nested_centered, wide)


def test_ref_compute_has_prev_line_capacity_scenarios():
    det = _detector()
    # prev line right margin 60; next first word width 20 -> 60 > 20+10: True
    prev = _line(50.0, 190.0)
    prev.right_margin = 60.0
    curr = _line(50.0, 250.0, words=[(50.0, 70.0)])
    assert det._has_prev_line_capacity(prev, curr)
    # margin 25 vs word width 20 (+tol 10) -> False
    prev.right_margin = 25.0
    assert not det._has_prev_line_capacity(prev, curr)
    # no previous line / no words -> False (…Utils.cpp:222-229)
    assert not det._has_prev_line_capacity(None, curr)
    assert not det._has_prev_line_capacity(prev, _line(50.0, 250.0))


def test_ref_compute_is_emphasized_scenarios():
    from pdftotext_plus_plus_spark.model import Block, FontInfo

    det = _detector()
    doc = det.doc
    doc.most_freq_font_name = "regular"
    doc.most_freq_font_size = 10.0
    doc.font_infos["regular"] = FontInfo(name="regular", weight=400)
    doc.font_infos["bold"] = FontInfo(name="bold", weight=700)
    doc.font_infos["italic"] = FontInfo(name="italic", weight=400,
                                        is_italic=True)

    def block(font, fs, text):
        b = Block()
        b.font_name, b.font_size, b.text = font, fs, text
        return b

    # larger font size -> emphasized (…Utils.cpp:183)
    assert det._is_emphasized(block("regular", 14.0, "some text"))
    # same size + bolder weight -> emphasized (:189-191)
    assert det._is_emphasized(block("bold", 10.0, "some text"))
    # same size + italic -> emphasized (:194-196)
    assert det._is_emphasized(block("italic", 10.0, "some text"))
    # all-caps -> emphasized (:202-214)
    assert det._is_emphasized(block("regular", 10.0, "ALL CAPS 123"))
    # plain -> not emphasized
    assert not det._is_emphasized(block("regular", 10.0, "plain text"))
    # smaller font + bold -> NOT emphasized (font size gate)
    assert not det._is_emphasized(block("bold", 8.0, "small bold"))
    # unknown font -> False (:168-174)
    assert not det._is_emphasized(block("ghost", 14.0, "text"))
