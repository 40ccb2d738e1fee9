"""T10 — sub/superscript detection + line base-bbox accumulation.

Reference: /root/reference/src/SubSuperScriptsDetection.cpp:48-104.
"""

from __future__ import annotations

from ..config import PipelineConfig
from ..model import Doc
from ..utils.mathutils import larger, smaller


def detect_sub_super_scripts(doc: Doc, config: PipelineConfig) -> None:
    for page in doc.pages:
        for segment in page.segments:
            for line in segment.lines:
                for word in line.words:
                    for ch in word.characters:
                        if smaller(ch.font_size, doc.most_freq_font_size,
                                   config.script_fs_equal_tolerance):
                            if smaller(ch.base, line.base,
                                       config.script_base_equal_tolerance):
                                ch.is_superscript = True
                                continue
                            if larger(ch.base, line.base,
                                      config.script_base_equal_tolerance):
                                ch.is_subscript = True
                                continue
                        # non-script chars accumulate the line's base bbox
                        line.base_bbox_left_x = min(line.base_bbox_left_x, ch.left_x)
                        line.base_bbox_upper_y = min(line.base_bbox_upper_y, ch.upper_y)
                        line.base_bbox_right_x = max(line.base_bbox_right_x, ch.right_x)
                        line.base_bbox_lower_y = max(line.base_bbox_lower_y, ch.lower_y)
