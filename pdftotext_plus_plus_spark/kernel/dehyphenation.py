"""T16 — words dehyphenation.

Reference: /root/reference/src/WordsDehyphenation.cpp:37-78.  The scan runs in
document order over block lines and the previous line persists across block
and page boundaries.
"""

from __future__ import annotations

from ..model import Doc, Word


def dehyphenate_words(doc: Doc) -> None:
    prev_line = None
    for page in doc.pages:
        for block in page.blocks:
            for line in block.lines:
                if not line.words:
                    continue
                if prev_line is not None:
                    prev_last = prev_line.words[-1]
                    prev_text = prev_last.text
                    if len(prev_text) > 1 and prev_text.endswith("-"):
                        curr_first = line.words[0]
                        merged = Word()
                        merged.text = prev_text[:-1] + curr_first.text
                        prev_last.is_first_part_of_hyphenated_word = merged
                        curr_first.is_second_part_of_hyphenated_word = merged
                prev_line = line
