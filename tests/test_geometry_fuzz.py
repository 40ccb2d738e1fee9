"""Adversarial geometry fuzz: arbitrary (grid-aligned) char placements must
never crash any pipeline stage, and the output must be deterministic
(identical across runs) — the property that makes resume/retry sound at
scale: a retried task re-produces the same bytes."""

import random

from hypothesis import given, settings, strategies as st

from pdftotext_plus_plus_spark import pipeline
from pdftotext_plus_plus_spark.codec import encode_payload
from pdftotext_plus_plus_spark.model import FontInfo

FONTS = [FontInfo(name="f0", weight=400), FontInfo(name="f1", weight=700)]

TEXT_POOL = "abcdefgHIJ∑-=.() "


def _random_doc(seed: int) -> bytes:
    rng = random.Random(seed)
    pages = []
    for page_num in range(1, rng.randint(1, 2) + 1):
        chars = []
        for _ in range(rng.randint(0, 60)):
            x = round(rng.uniform(0, 600), 1)
            y = round(rng.uniform(0, 780), 1)
            w = round(rng.uniform(0.1, 20), 1)
            h = round(rng.uniform(0.1, 20), 1)
            chars.append({
                "name": "", "text": rng.choice(TEXT_POOL),
                "unicodes": [],
                "left_x": x, "upper_y": y, "right_x": round(x + w, 1),
                "lower_y": round(y + h, 1), "base": round(y + h, 1),
                "font_size": round(rng.uniform(4, 20), 1),
                "rotation": rng.choice([0, 0, 0, 1, 2, 3]),
                "w_mode": rng.choice([0, 0, 0, 1]),
                "font": rng.choice(FONTS).name,
            })
        shapes = [(round(rng.uniform(0, 500), 1), round(rng.uniform(0, 700), 1),
                   round(rng.uniform(500, 612), 1), round(rng.uniform(700, 792), 1))
                  for _ in range(rng.randint(0, 2))]
        pages.append({"page_num": page_num, "chars": chars, "shapes": shapes})
    return encode_payload(FONTS, pages)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 10**9))
def test_fuzz_never_crashes_and_is_deterministic(seed):
    payload = _random_doc(seed)
    res1 = pipeline.extract(payload, with_spans=True)
    assert res1.parse_failure_code == 0
    assert res1.extracted_text.endswith("\n")
    res2 = pipeline.extract(payload, with_spans=True)
    assert res2.extracted_text == res1.extracted_text
    assert res2.extracted_text_extended == res1.extracted_text_extended
    assert [b.text for b in res2.blocks] == [b.text for b in res1.blocks]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**9))
def test_fuzz_roles_enabled_never_crashes(seed):
    from dataclasses import replace

    from pdftotext_plus_plus_spark.config import DEFAULT_CONFIG

    cfg = replace(DEFAULT_CONFIG, skip_semantic_roles=False)
    payload = _random_doc(seed)
    res = pipeline.extract(payload, config=cfg, with_spans=True,
                           jsonl_units=("blocks", "words", "characters"))
    assert res.parse_failure_code == 0
