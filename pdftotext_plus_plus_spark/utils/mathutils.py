"""Tolerance-aware float comparisons and rounding.

Behavior-parity notes (reference: /root/reference/src/utils/MathUtils.cpp:20-59):

* the comparators are *asymmetric*: ``larger(a, b, tol)`` is ``a > b + tol``,
  ``smaller(a, b, tol)`` is ``a < b - tol`` — NOT a symmetric epsilon test;
* ``round`` is half-away-from-zero (C++ ``std::round``), whereas Python's
  builtin ``round`` is banker's rounding — we must not use the builtin.

Default tolerance: DEFAULT_DOUBLE_EQUAL_TOLERANCE = 0.0001
(/root/reference/src/Config.h:43).
"""

from __future__ import annotations

import math

TOL = 0.0001


def equal(d1: float, d2: float, tolerance: float = TOL) -> bool:
    return abs(d1 - d2) <= tolerance


def larger(d1: float, d2: float, tolerance: float = TOL) -> bool:
    return d1 > d2 + tolerance


def smaller(d1: float, d2: float, tolerance: float = TOL) -> bool:
    return d1 < d2 - tolerance


def equal_or_larger(d1: float, d2: float, tolerance: float = TOL) -> bool:
    return d1 >= d2 - tolerance


def equal_or_smaller(d1: float, d2: float, tolerance: float = TOL) -> bool:
    return d1 <= d2 + tolerance


def between(d: float, low: float, up: float, tolerance: float = TOL) -> bool:
    return equal_or_larger(d, low, tolerance) and equal_or_smaller(d, up, tolerance)


def round_half_away(d: float, num_decimals: int = 0) -> float:
    """Round half away from zero, like C++ std::round (scaled).

    ``round_half_away(0.5) == 1.0``, ``round_half_away(-0.5) == -1.0`` —
    unlike Python's ``round`` which yields 0 for both.
    """
    if num_decimals == 0:
        return _std_round(d)
    divisor = 10.0 ** num_decimals
    return _std_round(d * divisor) / divisor


def _std_round(x: float) -> float:
    if x >= 0:
        return math.floor(x + 0.5)
    return math.ceil(x - 0.5)
