"""T2-T4 — words detection, word materialization, stacked-math merging.

References:
* detectWords / startsWord — /root/reference/src/WordsDetection.cpp:77-258
* createWord               — /root/reference/src/utils/WordsDetectionUtils.cpp:43-106
* mergeStackedMathSymbols  — /root/reference/src/WordsDetection.cpp:261-397
"""

from __future__ import annotations

import math

from ..config import PipelineConfig
from ..model import Doc, Page, Word
from ..utils.counter import most_freq
from ..utils.elements import max_x_overlap_ratio
from ..utils.mathutils import smaller


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
    min_y_ratio = config.words_min_y_overlap_ratio
    gap_factor = config.word_gap_threshold_factor

    ccols = page.char_cols
    if ccols is not None:
        # COLUMNAR path (simple pages): the decode columns ARE the word
        # detector's input — no Char objects exist, no attribute reads
        if not ccols.rows:
            return
        filtered = None
        data = ccols.rows
        raws = texts = ccols.texts
        fnames = ccols.font_names
        fsizes = ccols.fsizes
        bases = ccols.bases
        names = None
    else:
        if not page.characters:
            return
        # merged diacritic marks never start/join words (…cpp:117-121);
        # words are contiguous runs over the filtered sequence, so the
        # active word is just a start index plus the accumulated bbox state
        filtered = [c for c in page.characters
                    if c.diacritic_mark_of_base_char is None]
        if not filtered:
            return
        # a merged mark implies a filtered char, so equal lengths mean the
        # page has no diacritics at all -> the branch-free text fast path
        has_dia = len(filtered) != len(page.characters)
        data = [(c.left_x, c.upper_y, c.right_x, c.lower_y,
                 c.rotation, c.w_mode, c.font_size, c.base) for c in filtered]
        # page-level attribute columns: words materialize from C-level
        # slices of these instead of re-touching every Char object per word
        if has_dia:
            raws = [c.text for c in filtered]
            texts = [c.text_with_diacritic_mark
                     if c.base_char_of_diacritic_mark is not None else c.text
                     for c in filtered]
        else:
            raws = texts = [c.text for c in filtered]
        fnames = [c.font_name for c in filtered]
        fsizes = [c.font_size for c in filtered]
        bases = [c.base for c in filtered]
        names = [c.name for c in filtered]
    cols = (texts, fnames, fsizes, bases, raws, names)

    start = -1
    aw_left = aw_up = math.inf
    aw_right = aw_low = -math.inf
    aw_rot = aw_wmode = 0
    aw_fs = 0.0
    bounds = [0]  # word-start indices into `filtered` (words are contiguous)
    wboxes = []   # finished-word bboxes, tracked by the scan itself

    if ccols is not None and ccols.all_upright:
        # UPRIGHT specialization (rotation == w_mode == 0 for every char,
        # a decode-time page fact): the rotation/w_mode break test and the
        # rotation sign flips in horizontal_gap vanish; identical
        # semantics for rot=0 (WordsDetection.cpp:77-258)
        for i, row in enumerate(data):
            c_left, c_up, c_right, c_low, _, _, c_fs, _ = row

            starts = False
            if start >= 0:
                overlap = (c_low if c_low < aw_low else aw_low) - \
                          (c_up if c_up > aw_up else aw_up)
                if overlap < 0.0:
                    overlap = 0.0
                len1 = c_low - c_up
                len2 = aw_low - aw_up
                r1 = overlap / len1 if len1 > 0 else 0.0
                r2 = overlap / len2 if len2 > 0 else 0.0
                if (r1 if r1 >= r2 else r2) < min_y_ratio - _TOL:
                    starts = True
                else:
                    threshold = gap_factor * aw_fs + _TOL
                    # rot 0: gap = right element's left - left element's
                    # right, with the leftmost-by-smaller() selection
                    gap1 = (aw_left - c_right if c_left < aw_left - _TOL
                            else c_left - aw_right)
                    gap2 = (c_left - aw_right if aw_left < c_left - _TOL
                            else aw_left - c_right)
                    if gap1 > threshold or gap2 > threshold:
                        starts = True

            if starts:
                bounds.append(i)
                wboxes.append((aw_left, aw_up, aw_right, aw_low))
                aw_left = aw_up = math.inf
                aw_right = aw_low = -math.inf
                aw_fs = 0.0

            start = i
            if c_left < aw_left:
                aw_left = c_left
            if c_up < aw_up:
                aw_up = c_up
            if c_right > aw_right:
                aw_right = c_right
            if c_low > aw_low:
                aw_low = c_low
            if c_fs > aw_fs:
                aw_fs = c_fs
        wboxes.append((aw_left, aw_up, aw_right, aw_low))
        _materialize_words(page, filtered, data, cols, bounds, wboxes,
                           config)
        return

    for i, row in enumerate(data):
        c_left, c_up, c_right, c_low, c_rot, c_wmode, c_fs, _ = row

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
            bounds.append(i)
            wboxes.append((aw_left, aw_up, aw_right, aw_low))
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

    wboxes.append((aw_left, aw_up, aw_right, aw_low))
    _materialize_words(page, filtered, data, cols, bounds, wboxes, config)


def _materialize_words(page, filtered, data, cols, bounds, wboxes,
                       config: PipelineConfig) -> None:
    """Materialize all of a page's words (createWord,
    WordsDetectionUtils.cpp:43-106) from page-level attribute columns.

    Word bboxes arrive precomputed from the scan loop (``wboxes`` — the
    scan's running min/max IS the word envelope, so no numpy reduceat
    pass is needed); the per-word Python work shrinks to the text join +
    mode picks + one slotted-object fill (with the rare annotation fields
    as class defaults, model.Word).  The T4 stacked-math base flag (raw
    char text / glyph name in the config sets, WordsDetection.cpp:272-283)
    is two C-level ``isdisjoint`` scans over the raw-text and name column
    slices."""
    texts, fnames, fsizes, bases, raws, names = cols
    stm_texts = config.stacked_math_char_texts
    stm_names = config.stacked_math_char_names
    stm_words = config.stacked_math_words
    n = len(data)
    ccols = page.char_cols if filtered is None else None
    # page-uniform font fast path: with one font name AND one font size on
    # the page, every word's mode is that value — the two per-word
    # most_freq passes collapse to constants
    uni_fname = uni_fsize = None
    if len(fnames) > 1:
        f0 = fnames[0]
        if fnames.count(f0) == len(fnames):
            s0 = fsizes[0]
            if fsizes.count(s0) == len(fsizes):
                uni_fname, uni_fsize = f0, s0
    page_num = page.page_num
    words = page.words
    n_words = len(bounds)
    new = Word.__new__
    for wi in range(n_words):
        s = bounds[wi]
        e = bounds[wi + 1] if wi + 1 < n_words else n
        word = new(Word)
        word.page_num = page_num
        box = wboxes[wi]
        word.left_x = box[0]
        word.upper_y = box[1]
        word.right_x = box[2]
        word.lower_y = box[3]
        raw_slice = raws[s:e]
        if e - s == 1:  # single-char fast path (most words in math/sparse text)
            word.text = texts[s]
            font_names = fnames[s:e]
            font_sizes = fsizes[s:e]
            word.font_name = font_names[0]
            word.font_size = font_sizes[0]
        else:
            word.text = "".join(raw_slice if raws is texts else texts[s:e])
            font_names = fnames[s:e]
            font_sizes = fsizes[s:e]
            if uni_fname is not None:
                word.font_name = uni_fname
                word.font_size = uni_fsize
            else:
                word.font_name = most_freq(font_names)
                word.font_size = most_freq(font_sizes)
        word.char_rows = data[s:e]
        word.char_texts = raw_slice
        word.char_font_names = font_names
        word.char_font_sizes = font_sizes
        word.char_bases = bases[s:e]
        row = data[s]
        word.rotation = int(row[4])
        word.w_mode = int(row[5])
        if ccols is None:
            word._chars = filtered[s:e]  # slot direct: skip the descriptor
            word.char_src = None
        else:
            word._chars = None  # lazy: CharCols.materialize(s, e)
            word.char_src = (ccols, s, e)
        word.line = None
        word.rank = wi
        if (word.text in stm_words
                or not stm_texts.isdisjoint(raw_slice)
                or (names is not None
                    and not stm_names.isdisjoint(names[s:e]))):
            word.is_stacked_math_base = True
        words.append(word)



def _merge_stacked_math_symbols(page: Page, config: PipelineConfig) -> None:
    """T4 (WordsDetection.cpp:261-397): words containing stacked-math base
    symbols absorb x-overlapping smaller-font neighbor words."""
    threshold = config.stacked_math_min_x_overlap_ratio
    words = page.words
    for i, word in enumerate(words):
        # flag precomputed from the raw-text/name columns at
        # materialization time (_materialize_words)
        if not word.is_stacked_math_base:
            continue

        # backward scan
        for j in range(i - 1, -1, -1):
            prev_word = words[j]
            if smaller(max_x_overlap_ratio(word, prev_word), threshold):
                break
            if not smaller(prev_word.font_size, word.font_size,
                           config.fs_equal_tolerance):
                break
            subs = word.is_base_of_stacked_math_symbol
            if not subs:  # class-default () -> install this word's own list
                subs = []
                word.is_base_of_stacked_math_symbol = subs
            subs.append(prev_word)
            prev_word.is_part_of_stacked_math_symbol = word

        # forward scan
        for j in range(i + 1, len(words)):
            next_word = words[j]
            if smaller(max_x_overlap_ratio(word, next_word), threshold):
                break
            if not smaller(next_word.font_size, word.font_size,
                           config.fs_equal_tolerance):
                break
            subs = word.is_base_of_stacked_math_symbol
            if not subs:
                subs = []
                word.is_base_of_stacked_math_symbol = subs
            subs.append(next_word)
            next_word.is_part_of_stacked_math_symbol = word
