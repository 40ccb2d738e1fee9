"""Property-based byte-identity: random document structures within the
fixture geometry contract must always extract byte-identically — a much
wider net than the per-family seeds."""

import random

from hypothesis import given, settings, strategies as st

from pdftotext_plus_plus_spark import fixtures, pipeline
from pdftotext_plus_plus_spark.codec import encode_payload
from pdftotext_plus_plus_spark.fixtures import (FONTS, MARGIN_X, TOP_BASE,
                                                _layout_paragraphs,
                                                _PageBuilder, golden_from_blocks,
                                                make_lines)


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 3), st.integers(1, 4),
       st.booleans())
def test_random_multi_page_docs(seed, n_pages, paras_per_page, hyphenate):
    rng = random.Random(seed)
    pages = []
    all_paragraphs = []
    for page_num in range(1, n_pages + 1):
        page = _PageBuilder(page_num)
        paragraphs = [make_lines(rng, rng.randint(2, 5))
                      for _ in range(paras_per_page)]
        if hyphenate and rng.random() < 0.7:
            # hyphenate a random non-final position: swap the last word of a
            # random line for a one-shorter word + '-'
            para = rng.choice(paragraphs)
            line = rng.choice(para)
            last = line[-1]
            shorter = next((w for w in fixtures.WORD_POOL
                            if len(w) == len(last) - 1), last[:-1])
            line[-1] = shorter + "-"
        _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
        pages.append(page.to_dict())
        all_paragraphs.extend(paragraphs)
    payload = encode_payload(FONTS, pages)
    res = pipeline.extract(payload, with_spans=True)
    assert res.parse_failure_code == 0
    assert res.extracted_text == golden_from_blocks(all_paragraphs)
    assert [b.text for b in res.blocks] == \
        fixtures.golden_block_texts(all_paragraphs)
