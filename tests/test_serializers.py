"""Serializer surface: JSONL units, escapeJson, and config plumbing."""

import json
import random

from dataclasses import replace

from pdftotext_plus_plus_spark import fixtures, pipeline, serializers
from pdftotext_plus_plus_spark.config import DEFAULT_CONFIG


def _doc(family="plain-1col", seed=3):
    rng = random.Random(seed)
    payload, intent = fixtures.FAMILY_BUILDERS[family](rng)
    res = pipeline.extract(payload, keep_doc=True)
    return res.doc, intent


def test_escape_json():
    # exact port of TextUtils.cpp:102-137 behavior
    assert serializers.escape_json('a"b') == 'a\\"b'
    assert serializers.escape_json("back\\slash") == "back\\\\slash"
    assert serializers.escape_json("tab\there") == "tab\\there"
    assert serializers.escape_json("nl\n") == "nl\\n"
    assert serializers.escape_json("\x01ctl") == "\\u0001ctl"
    assert serializers.escape_json("plain") == "plain"


def test_jsonl_units_parse_and_counts():
    doc, intent = _doc()
    text = serializers.serialize_jsonl(
        doc, units=("pages", "blocks", "words", "characters"))
    records = [json.loads(line) for line in text.strip().split("\n")]
    by_type = {}
    for r in records:
        by_type.setdefault(r["type"], []).append(r)
    assert len(by_type["page"]) == len(doc.pages)
    n_blocks = sum(len(p.blocks) for p in doc.pages)
    assert len(by_type["block"]) == n_blocks
    assert [b["text"] for b in by_type["block"]] == \
        fixtures.golden_block_texts(intent)
    # every char references its word and block ids
    assert all(r["word"].startswith("word-") for r in by_type["char"])
    assert all(r["block"].startswith("block-") for r in by_type["char"])


def test_jsonl_diacritics_merged_chars():
    doc, _ = _doc("diacritics")
    text = serializers.serialize_jsonl(doc, units=("characters",))
    chars = [json.loads(line)["text"] for line in text.strip().split("\n")]
    assert "é" in chars          # merged NFC text substituted
    assert "́" not in chars      # the bare combining mark is skipped


def test_skip_flags_change_output():
    rng = random.Random(5)
    payload, intent = fixtures.FAMILY_BUILDERS["hyphenated"](rng)
    golden = fixtures.golden_from_blocks(intent)
    assert pipeline.extract(payload).extracted_text == golden
    no_dehyph = replace(DEFAULT_CONFIG, skip_dehyphenation=True)
    raw = pipeline.extract(payload, config=no_dehyph).extracted_text
    assert raw != golden
    assert "-" in raw  # the hyphen survives when the stage is skipped
