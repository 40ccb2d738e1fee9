"""XY-cut kernel: sweep mechanics, bounded overlap queue, group splitting."""

from pdftotext_plus_plus_spark.kernel import xycut
from pdftotext_plus_plus_spark.model import Element


def el(left, upper, right, lower):
    e = Element()
    e.left_x, e.upper_y, e.right_x, e.lower_y = left, upper, right, lower
    return e


def choose_all(cuts, elements, silent):
    for c in cuts:
        c.is_chosen = True


def choose_none(cuts, elements, silent):
    pass


def test_x_cut_basic_split():
    left = [el(0, 0, 10, 10), el(0, 12, 10, 22)]
    right = [el(30, 0, 40, 10), el(30, 12, 40, 22)]
    groups, cuts = [], []
    ok = xycut.x_cut(left + right, 5.0, 0, choose_all, True, groups, cuts)
    assert ok
    assert len(groups) == 2
    assert {id(e) for e in groups[0]} == {id(e) for e in left}
    assert cuts[0].gap_width == 20.0


def test_x_cut_no_gap():
    elems = [el(0, 0, 10, 10), el(12, 0, 22, 10)]
    groups = []
    ok = xycut.x_cut(elems, 5.0, 0, choose_all, True, groups)
    assert not ok
    assert len(groups) == 1  # the whole group is the trailing group


def test_x_cut_overlapping_element_allowed():
    # one element spans the gap; with maxOverlap=1 the cut is still found
    left = el(0, 0, 10, 10)
    spanner = el(0, 20, 40, 30)  # crosses the would-be cut
    right = el(30, 0, 40, 10)
    groups, cuts = [], []
    ok = xycut.x_cut([left, spanner, right], 5.0, 1, choose_all, True,
                     groups, cuts)
    assert ok
    assert len(cuts) == 1
    assert cuts[0].overlapping_elements == [spanner]
    # with maxOverlap=0 the spanner blocks the cut
    ok2 = xycut.x_cut([left, spanner, right], 5.0, 0, choose_all, True, [])
    assert not ok2


def test_y_cut_basic_split():
    top = [el(0, 0, 10, 10)]
    bottom = [el(0, 30, 10, 40)]
    groups, cuts = [], []
    ok = xycut.y_cut(top + bottom, 2.0, choose_all, True, groups, cuts)
    assert ok
    assert len(groups) == 2
    assert cuts[0].gap_height == 20.0


def test_y_cut_sweep_tracks_max_lower_y():
    # a tall element earlier in the sweep suppresses a later small gap
    tall = el(0, 0, 10, 50)
    small = el(20, 5, 30, 15)
    below = el(0, 30, 10, 40)  # gap vs `small` but overlapped by `tall`
    ok = xycut.y_cut([tall, small, below], 2.0, choose_all, True, [])
    assert not ok


def test_xy_cut_recursion():
    # 2x2 grid of clusters -> 4 groups
    g = [el(0, 0, 10, 10), el(30, 0, 40, 10), el(0, 30, 10, 40),
         el(30, 30, 40, 40)]
    groups = []
    xycut.xy_cut(g, 5.0, 5.0, 0, choose_all, choose_all, True, groups)
    assert len(groups) == 4


def test_choose_none_keeps_group():
    elems = [el(0, 0, 10, 10), el(30, 0, 40, 10)]
    groups = []
    xycut.xy_cut(elems, 5.0, 5.0, 0, choose_none, choose_none, True, groups)
    assert len(groups) == 1
    assert len(groups[0]) == 2


def test_x_cut_two_slot_matches_heap_reference():
    """The q_size==2 two-slot specialization must reproduce the bounded
    min-heap semantics exactly — candidate positions, element_before
    identity, and overlapping lists — on random element soups (including
    rightX ties, which exercise the stable older-first probe order)."""
    import heapq
    import random

    def reference_candidates(s_elements, min_gap_width):
        # the original heap-based sweep, maxOverlap == 1 (q_size 2)
        tol = 0.0001
        gap_floor = min_gap_width - tol
        heap = [(s_elements[0].right_x, 0, s_elements[0])]
        seq = 1
        out = []
        for pos in range(1, len(s_elements)):
            element = s_elements[pos]
            if len(heap) == 1:
                order = heap
            else:
                order = ([heap[1], heap[0]] if heap[1][0] > heap[0][0]
                         else [heap[0], heap[1]])
            overlapping = []
            for _, _, prev in order:
                if prev.left_x < element.left_x - tol:
                    le, re_ = prev, element
                else:
                    le, re_ = element, prev
                gap = (le.right_x - re_.left_x if le.rotation in (2, 3)
                       else re_.left_x - le.right_x)
                if gap >= gap_floor:
                    out.append((pos, id(prev), tuple(id(o) for o in overlapping)))
                    break
                overlapping.append(prev)
            if element.right_x > heap[0][0] + tol:
                if len(heap) == 2:
                    heapq.heappop(heap)
                heapq.heappush(heap, (element.right_x, seq, element))
                seq += 1
        return out

    rng = random.Random(7)
    for trial in range(200):
        n = rng.randint(2, 12)
        elems = []
        for _ in range(n):
            lx = rng.choice([0, 5, 10, 15, 20, 25])
            w = rng.choice([3, 5, 8, 10])
            elems.append(el(lx, rng.randint(0, 20), lx + w,
                            rng.randint(21, 40)))
        s_elems = sorted(elems, key=lambda e: e.left_x)
        expected = reference_candidates(s_elems, 4.0)
        cuts = []
        xycut.x_cut(list(elems), 4.0, 1, choose_none, True, None, cuts)
        got = [(c.pos_in_elements, id(c.element_before),
                tuple(id(o) for o in c.overlapping_elements)) for c in cuts]
        assert got == expected, trial
