"""T1 — diacritical-marks merging.

Reference: /root/reference/src/DiacriticalMarksMerging.cpp:55-215.
utf8proc's NFC composition is replaced by :func:`unicodedata.normalize`.
"""

from __future__ import annotations

import unicodedata

from ..config import COMBINING_MAP, PipelineConfig
from ..model import Doc
from ..utils.elements import max_x_overlap_ratio
from ..utils.mathutils import equal, larger


def merge_diacritical_marks(doc: Doc, config: PipelineConfig) -> None:
    for page in doc.pages:
        if page.ascii_only:
            # decode-time fact: every codepoint < 128, so no combining or
            # spacing marks (>= U+02B0) exist on the page
            continue
        chars = page.characters
        for i, curr in enumerate(chars):
            # only single-codepoint chars are candidates (…cpp:96-99)
            if len(curr.unicodes) != 1:
                continue
            unicode = curr.unicodes[0]
            unicode = COMBINING_MAP.get(unicode, unicode)
            # Spacing Modifier Letters or Combining Diacritic Marks
            is_mark = (0x02B0 <= unicode <= 0x02FF) or (0x0300 <= unicode <= 0x036F)
            if not is_mark:
                continue

            prev_char = chars[i - 1] if i > 0 else None
            next_char = chars[i + 1] if i < len(chars) - 1 else None

            prev_ratio = max_x_overlap_ratio(prev_char, curr) if prev_char else 0.0
            next_ratio = max_x_overlap_ratio(curr, next_char) if next_char else 0.0

            # no horizontal overlap on either side -> skip (…cpp:160-165)
            if equal(prev_ratio, 0.0) and equal(next_ratio, 0.0):
                continue

            base = prev_char if larger(prev_ratio, next_ratio) else next_char
            curr.diacritic_mark_of_base_char = base
            base.base_char_of_diacritic_mark = curr

            merged = "".join(chr(u) for u in base.unicodes) + chr(unicode)
            base.text_with_diacritic_mark = unicodedata.normalize("NFC", merged)

            base.left_x = min(base.left_x, curr.left_x)
            base.upper_y = min(base.upper_y, curr.upper_y)
            base.right_x = max(base.right_x, curr.right_x)
            base.lower_y = max(base.lower_y, curr.lower_y)
