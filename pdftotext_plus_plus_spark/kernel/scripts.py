"""T10 — sub/superscript detection + line base-bbox accumulation.

Reference: /root/reference/src/SubSuperScriptsDetection.cpp:48-104.
"""

from __future__ import annotations

from ..config import PipelineConfig
from ..model import Doc


def detect_sub_super_scripts(doc: Doc, config: PipelineConfig) -> None:
    fs_cutoff = doc.most_freq_font_size - config.script_fs_equal_tolerance
    base_tol = config.script_base_equal_tolerance
    for page in doc.pages:
        for segment in page.segments:
            for line in segment.lines:
                line_base = line.base
                for word in line.words:
                    for ch in word.characters:
                        # inlined tolerance comparators (MathUtils.cpp:25-32)
                        if ch.font_size < fs_cutoff:
                            if ch.base < line_base - base_tol:
                                ch.is_superscript = True
                                continue
                            if ch.base > line_base + base_tol:
                                ch.is_subscript = True
                                continue
                        # non-script chars accumulate the line's base bbox
                        if ch.left_x < line.base_bbox_left_x:
                            line.base_bbox_left_x = ch.left_x
                        if ch.upper_y < line.base_bbox_upper_y:
                            line.base_bbox_upper_y = ch.upper_y
                        if ch.right_x > line.base_bbox_right_x:
                            line.base_bbox_right_x = ch.right_x
                        if ch.lower_y > line.base_bbox_lower_y:
                            line.base_bbox_lower_y = ch.lower_y
