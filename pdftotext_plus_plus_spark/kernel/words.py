"""T2-T4 — words detection, word materialization, stacked-math merging.

References:
* detectWords / startsWord — /root/reference/src/WordsDetection.cpp:77-258
* createWord               — /root/reference/src/utils/WordsDetectionUtils.cpp:43-106
* mergeStackedMathSymbols  — /root/reference/src/WordsDetection.cpp:261-397
"""

from __future__ import annotations

import math
from typing import List

from ..config import PipelineConfig
from ..model import Char, Doc, Page, Word
from ..utils.counter import most_freq
from ..utils.elements import max_x_overlap_ratio
from ..utils.mathutils import smaller


class _ActiveWord(Word):
    """Accumulator mirroring the reference's mutable `_activeWord`."""
    __slots__ = ()


def detect_words(doc: Doc, config: PipelineConfig) -> None:
    for page in doc.pages:
        _detect_words_page(doc, page, config)
    for page in doc.pages:
        _merge_stacked_math_symbols(page, config)


_TOL = 0.0001


def _detect_words_page(doc: Doc, page: Page, config: PipelineConfig) -> None:
    """Sequential scan with the break rules of startsWord
    (WordsDetection.cpp:77-258), inlined on plain floats for speed — the
    semantics (tolerance comparators, asymmetric leftmost selection in the
    horizontal gap, rotation sign flips) are byte-for-byte those of
    utils.elements/utils.mathutils."""
    if not page.characters:
        return

    min_y_ratio = config.words_min_y_overlap_ratio
    gap_factor = config.word_gap_threshold_factor

    # merged diacritic marks never start/join words (…cpp:117-121); words are
    # contiguous runs over the filtered sequence, so the active word is just
    # a start index plus the accumulated bbox state
    filtered = [c for c in page.characters
                if c.diacritic_mark_of_base_char is None]
    if not filtered:
        return
    # a merged mark implies a filtered char, so equal lengths mean the page
    # has no diacritics at all -> the branch-free text fast path below
    has_dia = len(filtered) != len(page.characters)
    data = [(c.left_x, c.upper_y, c.right_x, c.lower_y,
             c.rotation, c.w_mode, c.font_size) for c in filtered]
    # page-level attribute columns: words materialize from C-level slices
    # of these instead of re-touching every Char object per word
    if has_dia:
        texts = [c.text_with_diacritic_mark
                 if c.base_char_of_diacritic_mark is not None else c.text
                 for c in filtered]
    else:
        texts = [c.text for c in filtered]
    fnames = [c.font_name for c in filtered]
    fsizes = [c.font_size for c in filtered]
    bases = [c.base for c in filtered]
    cols = (texts, fnames, fsizes, bases)

    start = -1
    aw_left = aw_up = math.inf
    aw_right = aw_low = -math.inf
    aw_rot = aw_wmode = 0
    aw_fs = 0.0

    for i, row in enumerate(data):
        c_left, c_up, c_right, c_low, c_rot, c_wmode, c_fs = row

        starts = False
        if start >= 0:
            if aw_rot != c_rot or aw_wmode != c_wmode:
                starts = True
            else:
                # max y-overlap ratio between char and active-word bbox
                overlap = (c_low if c_low < aw_low else aw_low) - \
                          (c_up if c_up > aw_up else aw_up)
                if overlap < 0.0:
                    overlap = 0.0
                len1 = c_low - c_up
                len2 = aw_low - aw_up
                r1 = overlap / len1 if len1 > 0 else 0.0
                r2 = overlap / len2 if len2 > 0 else 0.0
                ratio = r1 if r1 >= r2 else r2
                if ratio < min_y_ratio - _TOL:
                    starts = True
                else:
                    threshold = gap_factor * aw_fs
                    # horizontal_gap(curr, active): leftmost by smaller()
                    if c_left < aw_left - _TOL:
                        l_right, l_rot, r_left = c_right, c_rot, aw_left
                    else:
                        l_right, l_rot, r_left = aw_right, aw_rot, c_left
                    gap1 = (l_right - r_left) if l_rot in (2, 3) else (r_left - l_right)
                    # horizontal_gap(active, curr): arguments swapped
                    if aw_left < c_left - _TOL:
                        l_right, l_rot, r_left = aw_right, aw_rot, c_left
                    else:
                        l_right, l_rot, r_left = c_right, c_rot, aw_left
                    gap2 = (l_right - r_left) if l_rot in (2, 3) else (r_left - l_right)
                    if gap1 > threshold + _TOL or gap2 > threshold + _TOL:
                        starts = True

        if starts:
            word = _materialize_word(filtered, data, cols, start, i)
            word.rank = len(page.words)
            page.words.append(word)
            start = -1
            aw_left = aw_up = math.inf
            aw_right = aw_low = -math.inf
            aw_fs = 0.0

        if start < 0:
            start = i
        if c_left < aw_left:
            aw_left = c_left
        if c_up < aw_up:
            aw_up = c_up
        if c_right > aw_right:
            aw_right = c_right
        if c_low > aw_low:
            aw_low = c_low
        aw_rot = c_rot
        aw_wmode = c_wmode
        if c_fs > aw_fs:
            aw_fs = c_fs

    word = _materialize_word(filtered, data, cols, start, len(filtered))
    word.rank = len(page.words)
    page.words.append(word)


def _materialize_word(filtered, data, cols, start: int, end: int) -> Word:
    """Materialize a word (createWord, WordsDetectionUtils.cpp:43-106) from
    page-level attribute columns — C-level slices replace the old per-char
    Python accumulation loop (this runs once per word, the #2 kernel
    hotspot)."""
    texts, fnames, fsizes, bases = cols
    word = Word()
    characters = filtered[start:end]
    word.page_num = characters[0].page_num
    word.text = "".join(texts[start:end])
    if end - start == 1:  # single-char fast path (no zip)
        row = data[start]
        word.left_x, word.upper_y, word.right_x, word.lower_y = row[:4]
    else:
        lefts, ups, rights, lows, _, _, _ = zip(*data[start:end])
        word.left_x = min(lefts)
        word.upper_y = min(ups)
        word.right_x = max(rights)
        word.lower_y = max(lows)
    font_names = fnames[start:end]
    font_sizes = fsizes[start:end]
    word.font_name = most_freq(font_names)
    word.font_size = most_freq(font_sizes)
    word.char_font_names = font_names
    word.char_font_sizes = font_sizes
    word.char_bases = bases[start:end]
    word.w_mode = characters[0].w_mode
    word.rotation = characters[0].rotation
    word.characters = characters
    return word



def _merge_stacked_math_symbols(page: Page, config: PipelineConfig) -> None:
    """T4 (WordsDetection.cpp:261-397): words containing stacked-math base
    symbols absorb x-overlapping smaller-font neighbor words."""
    threshold = config.stacked_math_min_x_overlap_ratio
    words = page.words
    for i, word in enumerate(words):
        is_base = any(ch.text in config.stacked_math_char_texts
                      or ch.name in config.stacked_math_char_names
                      for ch in word.characters)
        if word.text in config.stacked_math_words:
            is_base = True
        if not is_base:
            continue

        # backward scan
        for j in range(i - 1, -1, -1):
            prev_word = words[j]
            if smaller(max_x_overlap_ratio(word, prev_word), threshold):
                break
            if not smaller(prev_word.font_size, word.font_size,
                           config.fs_equal_tolerance):
                break
            word.is_base_of_stacked_math_symbol.append(prev_word)
            prev_word.is_part_of_stacked_math_symbol = word

        # forward scan
        for j in range(i + 1, len(words)):
            next_word = words[j]
            if smaller(max_x_overlap_ratio(word, next_word), threshold):
                break
            if not smaller(next_word.font_size, word.font_size,
                           config.fs_equal_tolerance):
                break
            word.is_base_of_stacked_math_symbol.append(next_word)
            next_word.is_part_of_stacked_math_symbol = word
