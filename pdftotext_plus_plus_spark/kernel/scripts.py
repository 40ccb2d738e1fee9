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
                sup_cut = line_base - base_tol
                sub_cut = line_base + base_tol
                # base bbox accumulated in locals (4 attribute reads per
                # char otherwise), written back once per line
                bb_l = line.base_bbox_left_x
                bb_u = line.base_bbox_upper_y
                bb_r = line.base_bbox_right_x
                bb_o = line.base_bbox_lower_y
                for word in line.words:
                    for ch in word.characters:
                        # inlined tolerance comparators (MathUtils.cpp:25-32)
                        if ch.font_size < fs_cutoff:
                            if ch.base < sup_cut:
                                ch.is_superscript = True
                                continue
                            if ch.base > sub_cut:
                                ch.is_subscript = True
                                continue
                        # non-script chars accumulate the line's base bbox
                        if ch.left_x < bb_l:
                            bb_l = ch.left_x
                        if ch.upper_y < bb_u:
                            bb_u = ch.upper_y
                        if ch.right_x > bb_r:
                            bb_r = ch.right_x
                        if ch.lower_y > bb_o:
                            bb_o = ch.lower_y
                line.base_bbox_left_x = bb_l
                line.base_bbox_upper_y = bb_u
                line.base_bbox_right_x = bb_r
                line.base_bbox_lower_y = bb_o
