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
from ..utils.counter import ModeCounter
from ..utils.elements import (horizontal_gap, max_x_overlap_ratio,
                              max_y_overlap_ratio)
from ..utils.mathutils import larger, smaller


class _ActiveWord(Word):
    """Accumulator mirroring the reference's mutable `_activeWord`."""
    __slots__ = ()


def detect_words(doc: Doc, config: PipelineConfig) -> None:
    for page in doc.pages:
        _detect_words_page(doc, page, config)
    for page in doc.pages:
        _merge_stacked_math_symbols(page, config)


def _detect_words_page(doc: Doc, page: Page, config: PipelineConfig) -> None:
    if not page.characters:
        return

    active = _ActiveWord()
    active.page_num = page.page_num

    def reset(a: _ActiveWord) -> None:
        a.characters = []
        a.left_x = math.inf
        a.upper_y = math.inf
        a.right_x = -math.inf
        a.lower_y = -math.inf
        a.rotation = 0
        a.w_mode = 0
        a.font_size = 0.0

    reset(active)

    for curr in page.characters:
        # merged diacritic marks never start/join words (…cpp:117-121)
        if curr.diacritic_mark_of_base_char is not None:
            continue

        if active.characters and _starts_word(doc, active, curr, config):
            word = _create_word(active.characters, config)
            word.rank = len(page.words)
            page.words.append(word)
            reset(active)

        active.characters.append(curr)
        active.left_x = min(active.left_x, curr.left_x)
        active.upper_y = min(active.upper_y, curr.upper_y)
        active.right_x = max(active.right_x, curr.right_x)
        active.lower_y = max(active.lower_y, curr.lower_y)
        active.rotation = curr.rotation
        active.w_mode = curr.w_mode
        active.font_size = max(active.font_size, curr.font_size)

    if active.characters:
        word = _create_word(active.characters, config)
        word.rank = len(page.words)
        page.words.append(word)


def _starts_word(doc: Doc, active: _ActiveWord, curr: Char,
                 config: PipelineConfig) -> bool:
    """Break rules in reference order (WordsDetection.cpp:176-258)."""
    if not active.characters:
        return True
    if active.rotation != curr.rotation:
        return True
    if active.w_mode != curr.w_mode:
        return True
    if smaller(max_y_overlap_ratio(curr, active), config.words_min_y_overlap_ratio):
        return True
    # horizontal gaps on either side vs 0.15 * activeWord.fontSize
    threshold = config.word_gap_threshold_factor * active.font_size
    if larger(horizontal_gap(curr, active), threshold):
        return True
    if larger(horizontal_gap(active, curr), threshold):
        return True
    return False


def _create_word(characters: List[Char], config: PipelineConfig) -> Word:
    """Materialize a word from chars (WordsDetectionUtils.cpp:43-106)."""
    word = Word()
    word.page_num = characters[0].page_num
    font_name_counter = ModeCounter()
    font_size_counter = ModeCounter()
    text_parts: List[str] = []
    for ch in characters:
        word.left_x = min(word.left_x, ch.left_x)
        word.upper_y = min(word.upper_y, ch.upper_y)
        word.right_x = max(word.right_x, ch.right_x)
        word.lower_y = max(word.lower_y, ch.lower_y)
        if ch.base_char_of_diacritic_mark is not None:
            text_parts.append(ch.text_with_diacritic_mark)
        elif ch.diacritic_mark_of_base_char is None:
            text_parts.append(ch.text)
        font_name_counter.inc(ch.font_name)
        font_size_counter.inc(ch.font_size)
        ch.word = word
    word.text = "".join(text_parts)
    if font_name_counter.sum_counts() > 0:
        word.font_name = font_name_counter.most_freq()
    if font_size_counter.sum_counts() > 0:
        word.font_size = font_size_counter.most_freq()
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
