"""Geometric kernels over elements.

Reference: /root/reference/src/utils/PdfElementsUtils.cpp:38-217.  The gap
functions pick the left/upper element via the tolerance comparator `smaller`
and are rotation-aware; the overlap-ratio helpers operate on raw intervals.
"""

from __future__ import annotations

from typing import Tuple

from .mathutils import equal, smaller

__all__ = [
    "horizontal_gap", "vertical_gap", "overlap_ratios", "x_overlap_ratios",
    "y_overlap_ratios", "max_x_overlap_ratio", "max_y_overlap_ratio",
    "left_x_offset", "right_x_offset", "has_equal_left_x", "has_equal_font",
    "has_equal_font_size",
]


def horizontal_gap(elem1, elem2) -> float:
    """Signed horizontal gap (PdfElementsUtils.cpp:38-63)."""
    if smaller(elem1.left_x, elem2.left_x):
        left, right = elem1, elem2
    else:
        left, right = elem2, elem1
    if left.rotation in (2, 3):
        return left.right_x - right.left_x
    return right.left_x - left.right_x


def vertical_gap(elem1, elem2) -> float:
    """Signed vertical gap (PdfElementsUtils.cpp:66-91)."""
    if smaller(elem1.upper_y, elem2.upper_y):
        upper, lower = elem1, elem2
    else:
        upper, lower = elem2, elem1
    if upper.rotation in (2, 3):
        return upper.lower_y - lower.upper_y
    return lower.upper_y - upper.lower_y


def overlap_ratios(s1: float, e1: float, s2: float, e2: float) -> Tuple[float, float]:
    """Fraction of each interval covered by the overlap (…cpp:94-115)."""
    min1, max1 = (s1, e1) if s1 <= e1 else (e1, s1)
    min2, max2 = (s2, e2) if s2 <= e2 else (e2, s2)
    length1 = max1 - min1
    length2 = max2 - min2
    overlap = max(0.0, min(max1, max2) - max(min1, min2))
    r1 = overlap / length1 if length1 > 0 else 0.0
    r2 = overlap / length2 if length2 > 0 else 0.0
    return r1, r2


def x_overlap_ratios(e1, e2) -> Tuple[float, float]:
    return overlap_ratios(e1.left_x, e1.right_x, e2.left_x, e2.right_x)


def y_overlap_ratios(e1, e2) -> Tuple[float, float]:
    return overlap_ratios(e1.upper_y, e1.lower_y, e2.upper_y, e2.lower_y)


def max_x_overlap_ratio(e1, e2) -> float:
    r1, r2 = x_overlap_ratios(e1, e2)
    return r1 if r1 >= r2 else r2


def max_y_overlap_ratio(e1, e2) -> float:
    r1, r2 = y_overlap_ratios(e1, e2)
    return r1 if r1 >= r2 else r2


def left_x_offset(e1, e2) -> float:
    return e1.left_x - e2.left_x


def right_x_offset(e1, e2) -> float:
    return e1.right_x - e2.right_x


def has_equal_left_x(e1, e2, tolerance) -> bool:
    return equal(e1.left_x, e2.left_x, tolerance)


def has_equal_font(e1, e2) -> bool:
    return e1.font_name == e2.font_name


def has_equal_font_size(e1, e2, tolerance) -> bool:
    return equal(e1.font_size, e2.font_size, tolerance)
