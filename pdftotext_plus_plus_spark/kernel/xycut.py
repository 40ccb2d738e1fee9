"""T6 — the recursive XY-cut kernel.

Reference: /root/reference/src/utils/XYCut.cpp:46-325 plus the bounded
priority queue (/root/reference/src/utils/FixedCapacityPriorityQueue.h:29-85).

Determinism spec (SURVEY.md §7.1.3): the reference sorts with tolerance
comparators through std::sort (unstable for equal-within-tolerance keys); we
use Python's stable ``sorted`` on the raw key, and fixtures keep sort keys
separated by more than the tolerance.
"""

from __future__ import annotations

import heapq
from operator import attrgetter
from typing import Callable, List, Optional

_by_left_x = attrgetter("left_x")
_by_upper_y = attrgetter("upper_y")

X = "x"
Y = "y"

# choose function: (cuts, sorted_elements, silent) -> None (sets cut.is_chosen)
ChooseCutsFunc = Callable[[List["Cut"], List[object], bool], None]


class Cut:
    """An XY-cut candidate (cf. Cut, /root/reference/src/Types.h:1148-1239)."""

    __slots__ = ("dir", "pos_in_elements", "element_before", "element_after",
                 "page_num", "x1", "y1", "x2", "y2", "gap_width", "gap_height",
                 "overlapping_elements", "is_chosen")

    def __init__(self, direction: str, pos_in_elements: int = 0):
        self.dir = direction
        self.pos_in_elements = pos_in_elements
        self.element_before = None
        self.element_after = None
        self.page_num = 0
        self.x1 = self.y1 = self.x2 = self.y2 = 0.0
        self.gap_width = 0.0
        self.gap_height = 0.0
        self.overlapping_elements: List[object] = []
        self.is_chosen = False


def xy_cut(elements, min_x_cut_gap_width: float, min_y_cut_gap_height: float,
           max_num_overlapping_elements: int,
           choose_x_cuts: ChooseCutsFunc, choose_y_cuts: ChooseCutsFunc,
           silent: bool, result_groups: List[List[object]],
           result_cuts: Optional[List[Cut]] = None) -> None:
    """Recursive x-then-y alternation (XYCut.cpp:46-97)."""
    if not elements:
        return

    x_groups: List[List[object]] = []
    ok = x_cut(elements, min_x_cut_gap_width, max_num_overlapping_elements,
               choose_x_cuts, silent, x_groups, result_cuts)
    if not ok:
        y_groups: List[List[object]] = []
        ok = y_cut(elements, min_y_cut_gap_height, choose_y_cuts, silent,
                   y_groups, result_cuts)
        if not ok:
            result_groups.append(list(elements))
            return
        for y_group in y_groups:
            xy_cut(y_group, min_x_cut_gap_width, min_y_cut_gap_height,
                   max_num_overlapping_elements, choose_x_cuts, choose_y_cuts,
                   silent, result_groups, result_cuts)
        return

    for x_group in x_groups:
        y_groups = []
        ok = y_cut(x_group, min_y_cut_gap_height, choose_y_cuts, silent,
                   y_groups, result_cuts)
        if not ok:
            result_groups.append(x_group)
            continue
        for y_group in y_groups:
            xy_cut(y_group, min_x_cut_gap_width, min_y_cut_gap_height,
                   max_num_overlapping_elements, choose_x_cuts, choose_y_cuts,
                   silent, result_groups, result_cuts)


def _emit_x_cut(candidates, s_elements, pos, prev_element, element,
                gap_width, overlapping, extents):
    """Shared (cold-path) x-cut candidate construction for both queue
    implementations; ``extents`` caches the lazy (min_y, max_y) pair."""
    if extents[0] is None:
        extents[0] = min(e.upper_y for e in s_elements)
        extents[1] = max(e.lower_y for e in s_elements)
    cut = Cut(X, pos)
    cut.element_before = prev_element
    cut.element_after = element
    cut.page_num = element.page_num
    gap_x = prev_element.right_x + gap_width / 2.0
    cut.x1 = cut.x2 = gap_x
    cut.y1 = extents[0]
    cut.y2 = extents[1]
    cut.gap_width = gap_width
    cut.gap_height = extents[1] - extents[0]
    cut.overlapping_elements = overlapping
    candidates.append(cut)


def x_cut(elements, min_gap_width: float, max_num_overlapping_elements: int,
          choose_cuts: ChooseCutsFunc, silent: bool,
          result_groups: Optional[List[List[object]]] = None,
          result_cuts: Optional[List[Cut]] = None) -> bool:
    """Vertical-line cuts over a left-to-right sweep (XYCut.cpp:100-228).

    A bounded min-heap keeps the <maxOverlap+1> elements with the largest
    rightX seen so far; a gap to any of them (checked in descending rightX
    order) that reaches ``min_gap_width`` yields a candidate whose
    ``overlapping_elements`` are the closer elements that failed the check.
    """
    if not elements:
        return False

    s_elements = sorted(elements, key=_by_left_x)

    # extents are only needed when a candidate exists — most calls on deep
    # recursion levels produce none, so compute them lazily (shared cache
    # for both queue implementations, filled by _emit_x_cut)
    extents = [None, None]

    # min-heap keyed by rightX; entry = (right_x, seq, element)
    q_size = max_num_overlapping_elements + 1

    candidates: List[Cut] = []
    tol = 0.0001  # utils.mathutils.TOL, inlined in the hot loop
    gap_floor = min_gap_width - tol  # equal_or_larger(gap, min_gap_width)
    if q_size == 2:
        # two-slot specialization of the bounded queue (the production
        # config: maxOverlap = 1).  (rx_a, el_a) is the lexicographic
        # (rightX, seq) minimum of the two live entries, (rx_b, el_b) the
        # maximum — exactly the heap's ordering, including the stable
        # older-first iteration on rightX ties.
        el_a = s_elements[0]
        rx_a = el_a.right_x
        el_b = None
        rx_b = 0.0
        for pos in range(1, len(s_elements)):
            element = s_elements[pos]
            e_left = element.left_x

            overlapping: List[object] = []
            # probe order: descending rightX, older-first on ties
            if el_b is None:
                probes = (el_a,)
            elif rx_b > rx_a:
                probes = (el_b, el_a)
            else:
                probes = (el_a, el_b)
            for prev_element in probes:
                # horizontal_gap(prev_element, element), inlined
                if prev_element.left_x < e_left - tol:
                    left_el, right_el = prev_element, element
                else:
                    left_el, right_el = element, prev_element
                if left_el.rotation in (2, 3):
                    gap_width = left_el.right_x - right_el.left_x
                else:
                    gap_width = right_el.left_x - left_el.right_x
                if gap_width >= gap_floor:
                    _emit_x_cut(candidates, s_elements, pos, prev_element,
                                element, gap_width, overlapping, extents)
                    break
                overlapping.append(prev_element)

            # push iff strictly larger rightX than the queue minimum
            # (XYCut.cpp:187-189); the evicted entry is the minimum
            e_right = element.right_x
            if e_right > rx_a + tol:
                if el_b is None:
                    rx_b, el_b = e_right, element
                elif e_right >= rx_b:
                    # new entry has the larger (rx, seq): b -> a, new -> b
                    rx_a, el_a = rx_b, el_b
                    rx_b, el_b = e_right, element
                else:
                    rx_a, el_a = e_right, element
    else:
        heap = [(s_elements[0].right_x, 0, s_elements[0])]
        seq = 1
        for pos in range(1, len(s_elements)):
            element = s_elements[pos]
            e_left = element.left_x

            # queue contents in descending rightX order (stable for ties,
            # like sorted(key=-right_x))
            n_heap = len(heap)
            if n_heap == 1:
                by_right_x_desc = heap
            elif n_heap == 2:
                by_right_x_desc = ([heap[1], heap[0]]
                                   if heap[1][0] > heap[0][0]
                                   else [heap[0], heap[1]])
            else:
                by_right_x_desc = sorted(heap, key=lambda t: -t[0])
            overlapping = []
            for _, _, prev_element in by_right_x_desc:
                # horizontal_gap(prev_element, element), inlined
                if prev_element.left_x < e_left - tol:
                    left_el, right_el = prev_element, element
                else:
                    left_el, right_el = element, prev_element
                if left_el.rotation in (2, 3):
                    gap_width = left_el.right_x - right_el.left_x
                else:
                    gap_width = right_el.left_x - left_el.right_x
                if gap_width >= gap_floor:
                    _emit_x_cut(candidates, s_elements, pos, prev_element,
                                element, gap_width, overlapping, extents)
                    break
                overlapping.append(prev_element)

            # push iff strictly larger rightX than the queue minimum
            # (XYCut.cpp:187-189)
            if element.right_x > heap[0][0] + tol:
                if len(heap) == q_size:
                    heapq.heappop(heap)
                heapq.heappush(heap, (element.right_x, seq, element))
                seq += 1

    if not candidates:
        if result_groups is not None:
            result_groups.append(s_elements)
        return False
    choose_cuts(candidates, s_elements, silent)

    prev_cut_pos = 0
    has_chosen = False
    for cand in candidates:
        if result_cuts is not None:
            result_cuts.append(cand)
        if not cand.is_chosen:
            continue
        if result_groups is not None:
            result_groups.append(s_elements[prev_cut_pos:cand.pos_in_elements])
        has_chosen = True
        prev_cut_pos = cand.pos_in_elements
    if result_groups is not None:
        result_groups.append(s_elements[prev_cut_pos:])
    return has_chosen


def y_cut(elements, min_gap_height: float, choose_cuts: ChooseCutsFunc,
          silent: bool, result_groups: Optional[List[List[object]]] = None,
          result_cuts: Optional[List[Cut]] = None) -> bool:
    """Horizontal-line cuts over a top-to-bottom sweep (XYCut.cpp:231-325)."""
    if not elements:
        return False

    s_elements = sorted(elements, key=_by_upper_y)

    elements_min_x = elements_max_x = None  # lazy, like x_cut

    element_largest_lower_y = s_elements[0]
    ell_upper = element_largest_lower_y.upper_y
    ell_lower = element_largest_lower_y.lower_y

    candidates: List[Cut] = []
    tol = 0.0001  # utils.mathutils.TOL, comparators inlined
    gap_floor = min_gap_height - tol
    for pos in range(1, len(s_elements)):
        element = s_elements[pos]
        # vertical_gap(element_largest_lower_y, element), inlined: the
        # sweep is sorted by upper_y, so ell is the upper element unless
        # the uppers tie within TOL
        if ell_upper < element.upper_y - tol:
            upper, lower = element_largest_lower_y, element
        else:
            upper, lower = element, element_largest_lower_y
        if upper.rotation in (2, 3):
            gap_height = upper.lower_y - lower.upper_y
        else:
            gap_height = lower.upper_y - upper.lower_y
        if gap_height >= gap_floor:
            if elements_min_x is None:
                elements_min_x = min(e.left_x for e in s_elements)
                elements_max_x = max(e.right_x for e in s_elements)
            cut = Cut(Y, pos)
            cut.element_before = element_largest_lower_y
            cut.element_after = element
            cut.page_num = element.page_num
            gap_y = ell_lower + gap_height / 2.0
            cut.x1 = elements_min_x
            cut.x2 = elements_max_x
            cut.y1 = cut.y2 = gap_y
            cut.gap_width = elements_max_x - elements_min_x
            cut.gap_height = gap_height
            candidates.append(cut)
        e_lower = element.lower_y
        if e_lower > ell_lower + tol:
            element_largest_lower_y = element
            ell_upper = element.upper_y
            ell_lower = e_lower

    if not candidates:
        if result_groups is not None:
            result_groups.append(s_elements)
        return False
    choose_cuts(candidates, s_elements, silent)

    prev_cut_pos = 0
    has_chosen = False
    for cand in candidates:
        if result_cuts is not None:
            result_cuts.append(cand)
        if not cand.is_chosen:
            continue
        if result_groups is not None:
            result_groups.append(s_elements[prev_cut_pos:cand.pos_in_elements])
        has_chosen = True
        prev_cut_pos = cand.pos_in_elements
    if result_groups is not None:
        result_groups.append(s_elements[prev_cut_pos:])
    return has_chosen
