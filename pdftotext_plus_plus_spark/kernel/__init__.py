"""The 13-stage per-document pipeline as pure functions over :class:`~..model.Doc`.

Stage order mirrors the orchestrator
(/root/reference/src/PdfToTextPlusPlus.cpp:72-267); each stage can be skipped
via :class:`~..config.PipelineConfig` flags exactly like the reference's
``--skip-*`` options.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..model import Doc
from . import (blocks, dehyphenation, diacritics, lines, reading_order,
               roles, scripts, segmentation, stats, words)


def process_document(doc: Doc, config: PipelineConfig = DEFAULT_CONFIG) -> Doc:
    """Run stages 3-13 on a decoded document (stages 1-2 = codec.decode)."""
    stats.compute_glyph_statistics(doc)                      # (3)  A1
    if not config.skip_diacritics_merging:                   # (4)  T1
        diacritics.merge_diacritical_marks(doc, config)
    if not config.skip_words_detection:                      # (5)  T2-T4
        words.detect_words(doc, config)
    stats.compute_word_statistics(doc, config)               # (6)  A2
    if not config.skip_page_segmentation:                    # (7)  T5/T6
        segmentation.segment_pages(doc, config)
    if not config.skip_lines_detection:                      # (8)  T7-T9
        lines.detect_lines(doc, config)
    if not config.skip_sub_super_scripts:                    # (9)  T10
        scripts.detect_sub_super_scripts(doc, config)
    stats.compute_line_statistics(doc, config)               # (10) A3
    if not config.skip_blocks_detection:                     # (11) T11-T13
        blocks.detect_blocks(doc, config)
    if not config.skip_semantic_roles:                       # (12a) T15
        roles.predict_roles(doc, config)
    if not config.skip_reading_order:                        # (12b) T14
        reading_order.detect_reading_order(doc, config)
    if not config.skip_dehyphenation:                        # (13) T16
        dehyphenation.dehyphenate_words(doc)
    return doc
