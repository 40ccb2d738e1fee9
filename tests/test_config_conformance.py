"""Threshold conformance: DEFAULT_CONFIG must match the reference's
compiled-in values (/root/reference/src/Config.h) exactly — guards against
accidental drift in any of the ~30 interacting heuristic thresholds."""

from pdftotext_plus_plus_spark.config import (COMBINING_MAP,
                                              ITEM_LABEL_REGEXES,
                                              SEMANTIC_ROLE_NAMES,
                                              DEFAULT_CONFIG as C)


def test_base_config_values():
    assert C.coords_equal_tolerance == 0.1        # Config.h:73
    assert C.fs_equal_tolerance == 1.0            # Config.h:77
    assert C.font_weight_equal_tolerance == 100   # Config.h:81
    assert C.coordinate_precision == 1            # Config.h:85
    assert C.font_size_precision == 1             # Config.h:89
    assert C.line_distance_precision == 1         # Config.h:93
    assert C.formula_id_alphabet == "=+"          # Config.h:96
    assert C.special_footnote_labels_alphabet == "*∗†‡§‖¶?"  # Config.h:103


def test_words_detection_values():
    assert C.words_min_y_overlap_ratio == 0.5     # Config.h:179
    assert C.stacked_math_char_texts == {"∑", "∏", "∫", "⊗"}  # Config.h:196
    assert C.stacked_math_char_names == {
        "summationdisplay", "productdisplay", "integraldisplay",
        "circlemultiplydisplay"}                  # Config.h:197-201
    assert C.stacked_math_words == {"sup", "lim"}  # Config.h:202
    assert C.stacked_math_min_x_overlap_ratio == 0.5  # Config.h:207
    assert C.word_gap_threshold_factor == 0.15    # Config.h:224-226


def test_page_segmentation_values():
    assert C.x_cut_max_num_overlapping_elements == 1  # Config.h:299
    assert C.x_cut_min_gap_width_factor == 2.0    # Config.h:313-315
    assert C.y_cut_min_gap_height == 2.0          # Config.h:329-331
    assert C.overlapping_min_num_elements == 500  # Config.h:340
    assert C.overlapping_margin_factor == 5.0     # Config.h:357-359
    assert C.small_gap_width_factor == 2.0        # Config.h:377-379
    assert C.small_gap_height_factor == 6.0       # Config.h:377-379
    assert C.contiguous_words_y_overlap_ratio == 0.1  # Config.h:386
    assert C.slim_group_width_factor == 10.0      # Config.h:402-404


def test_lines_and_scripts_values():
    assert C.line_hierarchy_max_line_dist == 10.0  # Config.h:419
    assert C.line_hierarchy_left_x_offset_factor == 1.0  # Config.h:427
    assert C.line_merge_small_x_gap_factor == 3.0  # Config.h:445-447
    assert C.line_merge_ratio_small_gap == 0.4
    assert C.line_merge_ratio_large_gap == 0.8
    assert C.trim_min_perc_lines_same_right_x == 0.5  # Config.h:452
    assert C.trim_box_coords_precision == 0       # Config.h:457
    assert C.script_base_equal_tolerance == 0.1   # Config.h:471
    assert C.script_fs_equal_tolerance == 0.9     # Config.h:478


def test_blocks_detection_values():
    assert C.last_name_prefixes == {"van", "von", "de"}  # Config.h:576
    assert C.centering_x_overlap_ratio_threshold == 0.99  # Config.h:586
    assert C.centering_x_offset_equal_tolerance_factor == 2.0  # Config.h:600-602
    assert C.centering_max_num_justified_lines == 5  # Config.h:611
    assert C.prev_line_capacity_threshold_factor == 2.0  # Config.h:637
    assert C.hang_indent_min_length_long_lines == 3  # Config.h:645
    assert C.hang_indent_num_non_indented_lines_threshold == 10  # Config.h:651
    assert C.hang_indent_num_long_lines_threshold == 4  # Config.h:657
    assert C.hang_indent_min_perc_lines_same_left_margin == 0.5  # Config.h:664
    assert C.hang_indent_num_lower_non_indented_threshold == 0  # Config.h:669
    assert C.hang_indent_num_lower_indented_threshold == 1  # Config.h:674
    assert C.hang_indent_margin_threshold_factor == 1.0  # Config.h:680
    assert C.figure_x_overlap_threshold == 0.5    # Config.h:685
    assert C.figure_y_overlap_threshold == 0.5    # Config.h:690
    assert C.super_item_label_alphabet == \
        "*∗abcdefghijklmnopqrstuvwxyz01234567890()"  # Config.h:696


def test_reading_order_values():
    assert C.reading_order_min_x_cut_gap_width == 0.0  # ReadingOrderDetection.h:178
    assert C.reading_order_min_y_cut_gap_height == 0.0  # :179
    assert C.separator_height_factor == 10.0      # ReadingOrderDetection.cpp:233
    assert C.separator_width_factor == 10.0       # :316


def test_role_names_enum_order():
    # Types.h:69-84 — enum order defines the role ids
    assert SEMANTIC_ROLE_NAMES == (
        "paragraph", "reference", "marginal", "footnote", "heading",
        "formula", "title", "author-info", "abstract", "date", "caption",
        "table", "other", "toc")


def test_combining_map_spot_checks():
    # Config.h:243-283 — spot-check well-known entries + size
    assert len(COMBINING_MAP) == 39
    assert COMBINING_MAP[0x0060] == 0x0300   # grave
    assert COMBINING_MAP[0x00B4] == 0x0301   # acute
    assert COMBINING_MAP[0x02C6] == 0x0302   # circumflex
    assert COMBINING_MAP[0x204E] == 0x0359


def test_item_label_regexes_behavior():
    # Config.h:699-718 — behavior on representative labels
    def matches(text):
        return any(rx.search(text) for rx in ITEM_LABEL_REGEXES)

    for label in ("• x", "- x", "– x", "+ x", "II. x", "(iv) x", "a. x",
                  "12. x", "(C1) x", "[2] x", "[Bu2] x", "A) x", "a1) x",
                  "PACS x"):
        assert matches(label), label
    for non_label in ("word x", "1x", "(toolong1) x", "reading. x",
                      "[TOOLONGG1] x"):
        assert not matches(non_label), non_label
