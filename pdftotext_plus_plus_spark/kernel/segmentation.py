"""T5 — page segmentation (column detection) via XY-cut with veto rules.

Reference: /root/reference/src/PageSegmentation.cpp:66-493.
"""

from __future__ import annotations

from typing import List

from ..config import PipelineConfig
from ..model import Doc, Page, Segment, Word
from ..utils.elements import max_y_overlap_ratio
from ..utils.mathutils import smaller
from . import xycut
from .xycut import Cut


def segment_pages(doc: Doc, config: PipelineConfig) -> None:
    for page in doc.pages:
        _process_page(doc, page, config)


def _process_page(doc: Doc, page: Page, config: PipelineConfig) -> None:
    elements: List[object] = []
    elements.extend(page.words)
    elements.extend(page.figures)
    elements.extend(page.graphics)
    elements.extend(page.shapes)
    if not elements:
        return

    chooser = _CutChooser(doc, config)
    groups: List[List[object]] = []
    xycut.xy_cut(elements,
                 config.x_cut_min_gap_width_factor * doc.most_freq_word_distance,
                 config.y_cut_min_gap_height,
                 config.x_cut_max_num_overlapping_elements,
                 chooser.choose_x_cuts, chooser.choose_y_cuts,
                 False, groups, page.segment_cuts)

    for group in groups:
        page.segments.append(_create_segment(group))


def _create_segment(elements: List[object]) -> Segment:
    """Envelope aggregation (PageSegmentationUtils.cpp:39-64)."""
    segment = Segment()
    segment.page_num = elements[0].page_num if elements else -1
    for el in elements:
        segment.left_x = min(segment.left_x, el.left_x)
        segment.upper_y = min(segment.upper_y, el.upper_y)
        segment.right_x = max(segment.right_x, el.right_x)
        segment.lower_y = max(segment.lower_y, el.lower_y)
    segment.elements = elements
    return segment


class _CutChooser:
    """The x-cut veto chain and pairwise y-cut chooser
    (PageSegmentation.cpp:130-493)."""

    def __init__(self, doc: Doc, config: PipelineConfig):
        self.doc = doc
        self.config = config

    # --- x-cuts ---------------------------------------------------------
    def choose_x_cuts(self, cuts: List[Cut], elements: List[object],
                      silent: bool) -> None:
        if not elements:
            return
        prev_chosen_cut = None
        for cut in cuts:
            if self._veto_overlapping_elements(cut, elements):
                cut.is_chosen = False
                continue
            if self._veto_small_gap(cut):
                cut.is_chosen = False
                continue
            if self._veto_contiguous_words(cut, elements):
                cut.is_chosen = False
                continue
            if self._veto_slim_groups(prev_chosen_cut, cut, elements):
                cut.is_chosen = False
                continue
            cut.is_chosen = True
            prev_chosen_cut = cut

    def _veto_overlapping_elements(self, cut: Cut, elements: List[object]) -> bool:
        """Overlapping elements near the cut's ends (…cpp:208-263)."""
        if not cut.overlapping_elements:
            return False
        if len(elements) < self.config.overlapping_min_num_elements:
            return True
        margin = self.config.overlapping_margin_factor * self.doc.avg_char_height
        for el in cut.overlapping_elements:
            top_margin = el.upper_y - cut.y1
            bottom_margin = cut.y2 - el.lower_y
            if smaller(top_margin, margin) or smaller(bottom_margin, margin):
                return True
        return False

    def _veto_small_gap(self, cut: Cut) -> bool:
        """Gap width AND height both small (…cpp:266-289)."""
        w_threshold = self.config.small_gap_width_factor * self.doc.avg_char_width
        h_threshold = self.config.small_gap_height_factor * self.doc.avg_char_height
        return (smaller(cut.gap_width, w_threshold)
                and smaller(cut.gap_height, h_threshold))

    def _veto_contiguous_words(self, cut: Cut, elements: List[object]) -> bool:
        """Cut divides extraction-order-adjacent, y-overlapping words
        (…cpp:292-345)."""
        left_word = cut.element_before
        if not isinstance(left_word, Word):
            return False
        threshold = self.config.contiguous_words_y_overlap_ratio
        for i in range(cut.pos_in_elements, len(elements)):
            right_word = elements[i]
            if not isinstance(right_word, Word):
                continue
            if left_word.rank + 1 != right_word.rank:
                continue
            if smaller(max_y_overlap_ratio(left_word, right_word), threshold):
                continue
            return True
        return False

    def _veto_slim_groups(self, prev_chosen_cut, cut: Cut,
                          elements: List[object]) -> bool:
        """A resulting group slimmer than 10*avgCharWidth (…cpp:348-406)."""
        if not elements:
            return False
        threshold = self.config.slim_group_width_factor * self.doc.avg_char_width
        left_first = (prev_chosen_cut.element_after if prev_chosen_cut
                      else elements[0])
        left_last = cut.element_before
        left_width = left_last.right_x - left_first.left_x
        if smaller(left_width, threshold):
            return True
        right_first = cut.element_after
        right_last = elements[-1]
        right_width = right_last.right_x - right_first.left_x
        if smaller(right_width, threshold):
            return True
        return False

    # --- y-cuts ---------------------------------------------------------
    def choose_y_cuts(self, cuts: List[Cut], elements: List[object],
                      silent: bool) -> None:
        """Choose y-cut pairs whose span is x-cuttable (…cpp:409-493).

        Sentinel cuts stand in for the top and bottom page boundaries; their
        is_chosen flags are set but they are not part of `cuts`, so choosing
        them has no splitting effect — exactly like the reference.
        """
        if not cuts or not elements:
            return

        top = Cut(xycut.Y, 0)
        bottom = Cut(xycut.Y, len(elements))
        ccuts = [top] + list(cuts) + [bottom]

        min_gap_width = (self.config.x_cut_min_gap_width_factor
                         * self.doc.most_freq_word_distance)

        idx = 0
        while idx < len(ccuts):
            cut = ccuts[idx]
            partner_cut = None
            for other_idx in range(idx + 1, len(ccuts)):
                other_cut = ccuts[other_idx]
                elems = elements[cut.pos_in_elements:other_cut.pos_in_elements]
                cut_ok = xycut.x_cut(
                    elems, min_gap_width,
                    self.config.x_cut_max_num_overlapping_elements,
                    self.choose_x_cuts, True)
                if not cut_ok:
                    break
                partner_cut = other_cut
                idx = other_idx
            if partner_cut is not None:
                cut.is_chosen = True
                partner_cut.is_chosen = True
            idx += 1
