"""Mode ("most frequent value") counters.

Reference: DoubleCounter / StringCounter
(/root/reference/src/utils/Counter.{h,cpp}).

Determinism contract (SURVEY.md §7.1): the reference breaks frequency ties by
``unordered_map`` iteration order, i.e. hash order — effectively unspecified.
We define a deterministic tie-break instead: among values with the maximal
count, pick the *smallest* (numeric or lexicographic).  Golden fixtures avoid
statistic ties entirely, so this choice never changes fixture output; it only
pins down behavior on arbitrary inputs.
"""

from __future__ import annotations

from collections import Counter as _Counter
from typing import Iterable, Tuple, TypeVar

T = TypeVar("T")


class ModeCounter(dict):
    """dict value -> count with mostFreq()/max()/sumCounts() accessors."""

    def inc(self, value, by: int = 1) -> None:
        self[value] = self.get(value, 0) + by

    def most_freq_and_count(self) -> Tuple[object, int]:
        best_val, best_count = None, 0
        for val, count in self.items():
            if count > best_count or (count == best_count and count > 0
                                      and best_val is not None and val < best_val):
                best_val, best_count = val, count
        if best_count == 0:
            raise ValueError("counter is empty or all counts are 0")
        return best_val, best_count

    def most_freq(self):
        return self.most_freq_and_count()[0]

    def most_freq_count(self) -> int:
        return self.most_freq_and_count()[1]

    def max(self):
        """Largest *value* with a positive count (Counter.cpp:58-74)."""
        best = None
        for val, count in self.items():
            if count > 0 and (best is None or val > best):
                best = val
        if best is None:
            raise ValueError("counter is empty or all counts are 0")
        return best

    def sum_counts(self) -> int:
        return sum(self.values())


def most_freq(values: Iterable[T], default: T = None) -> T:
    """Mode of an iterable with the deterministic smallest-value tie-break."""
    if isinstance(values, list):
        if not values:
            return default
        # fast path: uniform lists (most words/lines are single-font);
        # list.count is one C-level pass vs a Python comparison loop
        first = values[0]
        if values.count(first) == len(values):
            return first
    counts = _Counter(values)
    if not counts:
        return default
    # max count first, then smallest value.
    best_count = max(counts.values())
    return min(v for v, c in counts.items() if c == best_count)
