"""T14 — reading-order detection.

Reference: /root/reference/src/ReadingOrderDetection.cpp:65-403.  Reuses the
XY-cut kernel with semantic choose-callbacks; min gap width/height are 0
(ReadingOrderDetection.h:178-179) — every inter-element gap is a candidate
and the callbacks do all filtering.

The final in-group sort uses the raw upperY (std::sort in the reference,
unspecified for ties); we use a stable sort per the determinism contract.
"""

from __future__ import annotations

from typing import List

from ..config import (ROLE_AUTHOR_INFO, ROLE_MARGINAL, ROLE_TITLE,
                      PipelineConfig)
from ..model import Block, Doc, NonTextElement
from . import xycut
from .xycut import Cut


def detect_reading_order(doc: Doc, config: PipelineConfig) -> None:
    if not doc.pages:
        return
    detector = _ReadingOrderDetector(doc, config)
    detector.process()


class _ReadingOrderDetector:
    def __init__(self, doc: Doc, config: PipelineConfig):
        self.doc = doc
        self.config = config
        self._min_x = self._min_y = 0.0
        self._max_x = self._max_y = 0.0

    def process(self) -> None:
        cfg = self.config
        for page in self.doc.pages:
            elements: List[object] = []
            elements.extend(page.blocks)
            elements.extend(page.figures)
            elements.extend(page.shapes)
            if not elements:
                continue

            self._min_x = min(e.left_x for e in elements)
            self._min_y = min(e.upper_y for e in elements)
            self._max_x = max(e.right_x for e in elements)
            self._max_y = max(e.lower_y for e in elements)

            groups: List[List[object]] = []
            primary_x_groups: List[List[object]] = []
            xycut.x_cut(elements, cfg.reading_order_min_x_cut_gap_width, 0,
                        self.choose_primary_x_cuts, False,
                        primary_x_groups, page.reading_order_cuts)
            for px_group in primary_x_groups:
                primary_y_groups: List[List[object]] = []
                xycut.y_cut(px_group, cfg.reading_order_min_y_cut_gap_height,
                            self.choose_primary_y_cuts, False,
                            primary_y_groups, page.reading_order_cuts)
                for py_group in primary_y_groups:
                    xycut.xy_cut(py_group,
                                 cfg.reading_order_min_x_cut_gap_width,
                                 cfg.reading_order_min_y_cut_gap_height, 0,
                                 self.choose_x_cuts, self.choose_y_cuts,
                                 False, groups, page.reading_order_cuts)

            blocks_sorted: List[Block] = []
            for group in groups:
                for element in sorted(group, key=lambda e: e.upper_y):
                    if isinstance(element, Block):
                        blocks_sorted.append(element)
            page.blocks = blocks_sorted

    # ------------------------------------------------------------------
    def choose_x_cuts(self, cuts: List[Cut], elements: List[object],
                      silent: bool) -> None:
        """Inner x-cuts: all candidates accepted (…cpp:158-164)."""
        for cut in cuts:
            cut.is_chosen = True

    def choose_primary_x_cuts(self, cuts: List[Cut], elements: List[object],
                              silent: bool) -> None:
        """Primary x-cuts (…cpp:167-253)."""
        if not elements or not cuts:
            return
        mid_y = self._min_y + (self._max_y - self._min_y) / 2.0
        sep_height = self.config.separator_height_factor * self.doc.avg_char_height
        for cut in cuts:
            before, after = cut.element_before, cut.element_after
            if isinstance(before, Block) and (before.w_mode != 0
                                              or before.rotation != 0):
                cut.is_chosen = True
                continue
            if isinstance(after, Block) and (after.w_mode != 0
                                             or after.rotation != 0):
                cut.is_chosen = True
                continue
            if isinstance(before, Block) and isinstance(after, Block):
                if before.w_mode != after.w_mode:
                    cut.is_chosen = True
                    continue
                if before.rotation != after.rotation:
                    cut.is_chosen = True
                    continue
            # a tall separator line flanking the cut (…cpp:225-251)
            for el in (before, after):
                if (isinstance(el, NonTextElement) and el.height > sep_height
                        and el.upper_y < mid_y and el.lower_y > mid_y):
                    cut.is_chosen = True
                    break

    def choose_primary_y_cuts(self, cuts: List[Cut], elements: List[object],
                              silent: bool) -> None:
        """Primary y-cuts: role boundaries or wide separators (…cpp:256-335)."""
        if not elements or not cuts:
            return
        mid_x = self._min_x + (self._max_x - self._min_x) / 2.0
        sep_width = self.config.separator_width_factor * self.doc.avg_char_width
        for cut in cuts:
            above, below = cut.element_before, cut.element_after
            for role in (ROLE_TITLE, ROLE_AUTHOR_INFO, ROLE_MARGINAL):
                is_above = isinstance(above, Block) and above.role == role
                is_below = isinstance(below, Block) and below.role == role
                if is_above != is_below:
                    cut.is_chosen = True
                    break
            if cut.is_chosen:
                continue
            for el in (above, below):
                if (isinstance(el, NonTextElement) and el.width > sep_width
                        and el.left_x < mid_x and el.right_x > mid_x):
                    cut.is_chosen = True
                    break

    def choose_y_cuts(self, cuts: List[Cut], elements: List[object],
                      silent: bool) -> None:
        """Semantic y-cut chooser: a y-cut is valid iff the region below /
        above / between a pair is x-cuttable (…cpp:338-403)."""
        if not elements or not cuts:
            return
        cfg = self.config

        def probe(group: List[object]) -> bool:
            return xycut.x_cut(group, cfg.reading_order_min_x_cut_gap_width,
                               0, self.choose_x_cuts, True)

        first_cut_index = 0
        last_cut_index = len(cuts) - 1

        for i, cut in enumerate(cuts):
            if probe(elements[cut.pos_in_elements:]):
                cut.is_chosen = True
                last_cut_index = i
                break

        for i in range(last_cut_index, first_cut_index - 1, -1):
            cut = cuts[i]
            if probe(elements[:cut.pos_in_elements]):
                cut.is_chosen = True
                first_cut_index = i
                break

        i = first_cut_index
        while i < last_cut_index:
            high_cut = cuts[i]
            advanced = False
            for j in range(last_cut_index, i - 1, -1):
                low_cut = cuts[j]
                group = elements[high_cut.pos_in_elements:low_cut.pos_in_elements]
                if probe(group):
                    high_cut.is_chosen = True
                    low_cut.is_chosen = True
                    i = j
                    advanced = True
                    break
            i += 1
