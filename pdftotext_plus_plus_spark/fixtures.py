"""Deterministic synthetic fixture corpus + golden outputs (FIXTURES.md).

A small layout engine places words on pages with the same geometry the
reference's heuristics key on (uniform word gaps, line distances, block
gaps, column gaps...).  Golden ``extracted_text`` is computed from the
*intent* (the paragraph structure given to the layout engine) by mirroring
the TXT serialization semantics
(/root/reference/src/serializers/PlainTextSerializer.cpp:38-92) — NOT by
running the pipeline — so the golden e2e tests are meaningful.

Geometry invariants (FIXTURES.md §2):
* all coordinates on a 0.1-pt grid;
* char width = 0.5 * fontSize, char height = 0.7 * fontSize;
* uniform intra-line word gap 0.25 * fontSize (> the 0.15*fontSize word-break
  threshold, Config.h:224-226);
* line distance (base-bbox gap) 2.0; block gap 8.0; column gap 20.0;
* per-document mode statistics have unique maximizers.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

from .codec import encode_payload
from .model import FontInfo

R1 = lambda x: round(x, 1)  # keep everything on the 0.1 grid

BODY_FONT = FontInfo(name="body-regular", ascent=0.75, descent=-0.25, weight=400)
BOLD_FONT = FontInfo(name="body-bold", ascent=0.75, descent=-0.25, weight=700)
ITALIC_FONT = FontInfo(name="body-italic", ascent=0.75, descent=-0.25,
                       weight=400, is_italic=True)
FONTS = [BODY_FONT, BOLD_FONT, ITALIC_FONT]

# words 3-6 chars keep the line-width spread below the prev-line-capacity
# threshold (see generator notes); plain alpha so no item-label regex matches
WORD_POOL = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs", "and",
    "then", "runs", "far", "away", "into", "deep", "dark", "woods", "while",
    "birds", "sing", "songs", "about", "old", "tales", "from", "past", "times",
    "when", "rivers", "ran", "clear", "under", "stone", "bridge", "near",
    "small", "town", "where", "people", "lived", "quiet", "happy", "lives",
]

FS_BODY = 10.0
CHAR_W = 0.5          # x fontSize
CHAR_H = 0.7          # x fontSize
WORD_GAP = 2.5        # for 10pt: > 1.5 break threshold, mode word distance
LINE_DIST = 2.0       # base-bbox vertical gap between consecutive lines
BLOCK_GAP = 8.0       # > expected 2.0 + max(1, 0.2)  (Config.h:504-507)
COL_GAP = 20.0        # > 2*mostFreqWordDistance=5 and > 2*avgCharWidth=10
LINE_UNITS = 40       # char units per justified line
MARGIN_X = 50.0
TOP_BASE = 80.0


# ---------------------------------------------------------------------------
# layout engine
# ---------------------------------------------------------------------------

@dataclass
class _PageBuilder:
    page_num: int
    chars: List[dict] = field(default_factory=list)
    figures: List[Tuple[float, float, float, float]] = field(default_factory=list)
    shapes: List[Tuple[float, float, float, float]] = field(default_factory=list)
    graphics: List[Tuple[float, float, float, float]] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {"page_num": self.page_num, "clip": (0.0, 0.0, 612.0, 792.0),
                "chars": self.chars, "figures": self.figures,
                "shapes": self.shapes, "graphics": self.graphics}


def place_word(page: _PageBuilder, text: str, x: float, base: float,
               font_size: float = FS_BODY, font: FontInfo = BODY_FONT,
               rotation: int = 0, char_specs: Optional[List[dict]] = None,
               ) -> float:
    """Place a word's chars left-to-right starting at x; returns next x."""
    cw = R1(CHAR_W * font_size)
    ch_h = R1(CHAR_H * font_size)
    if char_specs is None:
        char_specs = [{"text": c} for c in text]
    for spec in char_specs:
        width = spec.get("width", cw)
        page.chars.append({
            "name": spec.get("name", ""),
            "text": spec.get("text", ""),
            "unicodes": spec.get("unicodes",
                                 [ord(c) for c in spec.get("text", "")]),
            "left_x": R1(x), "upper_y": R1(base - ch_h),
            "right_x": R1(x + width), "lower_y": R1(base),
            "base": R1(base), "font_size": font_size, "rotation": rotation,
            "w_mode": 0, "font": font.name,
        })
        x += width
    return R1(x)


def place_line(page: _PageBuilder, words: List[str], x: float, base: float,
               font_size: float = FS_BODY, font: FontInfo = BODY_FONT,
               gap: float = WORD_GAP) -> float:
    for i, w in enumerate(words):
        x = place_word(page, w, x, base, font_size, font)
        if i < len(words) - 1:
            x = R1(x + gap)
    return x


def make_lines(rng: random.Random, n_lines: int,
               units: int = LINE_UNITS) -> List[List[str]]:
    """Lines of words whose char counts sum to exactly `units` (justified)."""
    lines = []
    for _ in range(n_lines):
        words: List[str] = []
        remaining = units
        while remaining > 0:
            choices = [w for w in WORD_POOL if len(w) <= remaining]
            # make sure we can always finish exactly
            finishers = [w for w in choices if len(w) == remaining]
            if finishers and (remaining <= 6 or rng.random() < 0.2):
                w = rng.choice(finishers)
            elif [w for w in choices if remaining - len(w) >= 3 or remaining - len(w) == 0]:
                w = rng.choice([w for w in choices
                                if remaining - len(w) >= 3 or remaining - len(w) == 0])
            else:
                w = rng.choice(choices)
            words.append(w)
            remaining -= len(w)
        lines.append(words)
    return lines


# ---------------------------------------------------------------------------
# golden-text mirror (intent level)
# ---------------------------------------------------------------------------

def golden_from_blocks(blocks: List[List[List[str]]]) -> str:
    """Mirror of TXT semantics over intended (block -> line -> words) text,
    including cross-block/page dehyphenation (WordsDehyphenation.cpp:37-78)."""
    # Flatten to (block_idx, line_words) preserving order.
    flat: List[Tuple[int, List[str]]] = []
    for b, block in enumerate(blocks):
        for line in block:
            if line:
                flat.append((b, list(line)))

    # Apply dehyphenation globally across consecutive non-empty lines.
    merged_first: Dict[Tuple[int, int], str] = {}
    skip_second: set = set()
    for i in range(1, len(flat)):
        prev_words = flat[i - 1][1]
        curr_words = flat[i][1]
        prev_text = prev_words[-1]
        if len(prev_text) > 1 and prev_text.endswith("-"):
            merged_first[(i - 1, len(prev_words) - 1)] = (
                prev_text[:-1] + curr_words[0])
            skip_second.add((i, 0))

    out_blocks: List[List[str]] = []
    current_block = -1
    for i, (b, words) in enumerate(flat):
        if b != current_block:
            out_blocks.append([])
            current_block = b
        for j, w in enumerate(words):
            if (i, j) in skip_second:
                continue
            out_blocks[-1].append(merged_first.get((i, j), w))

    return "\n\n".join(" ".join(ws) for ws in out_blocks if ws) + "\n"


# ---------------------------------------------------------------------------
# fixture families
# ---------------------------------------------------------------------------

def _layout_paragraphs(page: _PageBuilder, paragraphs: List[List[List[str]]],
                       x: float, start_base: float,
                       font_size: float = FS_BODY,
                       font: FontInfo = BODY_FONT) -> float:
    """Stack paragraphs at x; returns the base after the last line."""
    base = start_base
    step = R1(LINE_DIST + CHAR_H * font_size)
    block_step = R1(BLOCK_GAP + CHAR_H * font_size)
    for p, paragraph in enumerate(paragraphs):
        for li, line in enumerate(paragraph):
            place_line(page, line, x, base, font_size, font)
            base = R1(base + (step if li < len(paragraph) - 1 else 0))
        base = R1(base + block_step)
    return base


def build_plain_1col(rng: random.Random):
    """Minimum slice: words, lines, block splits by vertical gap."""
    n_paras = rng.randint(2, 4)
    paragraphs = [make_lines(rng, rng.randint(3, 5)) for _ in range(n_paras)]
    page = _PageBuilder(1)
    _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks(paragraphs)


def build_two_col(rng: random.Random):
    """T5/T6 column split + T14 reading order (left column first)."""
    n_lines = rng.randint(6, 8)
    col_a = [make_lines(rng, n_lines), make_lines(rng, n_lines)]
    col_b = [make_lines(rng, n_lines), make_lines(rng, n_lines)]
    page = _PageBuilder(1)
    # emit column A first (extraction order = reading order)
    _layout_paragraphs(page, col_a, MARGIN_X, TOP_BASE)
    col_a_width = LINE_UNITS * CHAR_W * FS_BODY / 10.0 * 1.0  # 40*5 = 200
    max_right = MARGIN_X + col_a_width + WORD_GAP * 12  # conservative
    col_b_x = R1(MARGIN_X + 230.0 + COL_GAP)
    _layout_paragraphs(page, col_b, col_b_x, TOP_BASE)
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks(col_a + col_b)


def build_hyphenated(rng: random.Random):
    """T16 dehyphenation within a paragraph."""
    paragraphs = [make_lines(rng, 4), make_lines(rng, 3)]
    # hyphenate the 2nd line of the first paragraph: replace its last word
    # with "<w>-" and keep total units constant (append a 0-pad? keep simple:
    # swap last word for one 1 char shorter + "-").
    line = paragraphs[0][1]
    last = line[-1]
    shorter = next((w for w in WORD_POOL if len(w) == len(last) - 1), None)
    if shorter is None:
        shorter = last[:-1]
    line[-1] = shorter + "-"
    page = _PageBuilder(1)
    _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks(paragraphs)


def build_diacritics(rng: random.Random):
    """T1 merging: combining and non-combining marks over base chars."""
    paragraphs = [make_lines(rng, 3)]
    page = _PageBuilder(1)
    base = TOP_BASE
    step = R1(LINE_DIST + CHAR_H * FS_BODY)
    for li, line in enumerate(paragraphs[0]):
        place_line(page, line, MARGIN_X, base)
        if li < len(paragraphs[0]) - 1:
            base = R1(base + step)
    # a final line "cafe" + combining acute over the 'e' -> "café"
    block_step = R1(BLOCK_GAP + CHAR_H * FS_BODY)
    base = R1(base + block_step)
    x = place_word(page, "caf", MARGIN_X, base)
    # base char 'e'
    e_left = x
    x = place_word(page, "e", x, base)
    # combining acute mark U+0301 drawn above the 'e', x-overlapping it
    page.chars.append({
        "name": "acutecomb", "text": "́", "unicodes": [0x0301],
        "left_x": R1(e_left + 1.0), "upper_y": R1(base - 9.0),
        "right_x": R1(e_left + 4.0), "lower_y": R1(base - 7.5),
        "base": R1(base), "font_size": FS_BODY, "rotation": 0, "w_mode": 0,
        "font": BODY_FONT.name,
    })
    x = R1(x + WORD_GAP)
    place_line(page, ["mood"], x, base)
    intended = paragraphs + [[["café", "mood"]]]
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks(intended)


def build_ligatures(rng: random.Random):
    """S2 ligature expansion: one char with unicodes [f,f,i] -> 'ffi'."""
    paragraphs = [make_lines(rng, 3)]
    page = _PageBuilder(1)
    _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
    base = R1(TOP_BASE + (len(paragraphs[0]) - 1) * (LINE_DIST + CHAR_H * FS_BODY)
              + BLOCK_GAP + CHAR_H * FS_BODY)
    x = place_word(page, "o", MARGIN_X, base)
    x = place_word(page, "", x, base, char_specs=[
        {"text": "", "name": "ffi-lig", "unicodes": [0x66, 0x66, 0x69],
         "width": 10.0}])
    x = place_word(page, "ce", x, base)
    x = R1(x + WORD_GAP)
    place_line(page, ["work"], x, base)
    intended = paragraphs + [[["office", "work"]]]
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks(intended)


def build_charnames(rng: random.Random):
    """S2 charMap fallback: glyph name only, no encoding."""
    paragraphs = [make_lines(rng, 3)]
    page = _PageBuilder(1)
    _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
    base = R1(TOP_BASE + (len(paragraphs[0]) - 1) * (LINE_DIST + CHAR_H * FS_BODY)
              + BLOCK_GAP + CHAR_H * FS_BODY)
    x = place_line(page, ["total"], MARGIN_X, base)
    x = R1(x + WORD_GAP)
    x = place_word(page, "", x, base, char_specs=[
        {"text": "", "name": "circlecopyrt", "unicodes": [], "width": 7.0}])
    intended = paragraphs + [[["total", "©"]]]
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks(intended)


def build_headings(rng: random.Random):
    """T11 font-size block split: a 14pt heading over 10pt body."""
    heading = [["Network", "Flows"]]
    body1 = make_lines(rng, rng.randint(3, 4))
    body2 = make_lines(rng, rng.randint(3, 4))
    page = _PageBuilder(1)
    fs_head = 14.0
    base = TOP_BASE
    place_line(page, heading[0], MARGIN_X, base, fs_head, BOLD_FONT)
    # heading -> body separated by the normal block gap
    base = R1(base + BLOCK_GAP + CHAR_H * FS_BODY)
    step = R1(LINE_DIST + CHAR_H * FS_BODY)
    for li, line in enumerate(body1):
        place_line(page, line, MARGIN_X, base)
        base = R1(base + step)
    base = R1(base - step + BLOCK_GAP + CHAR_H * FS_BODY)
    for li, line in enumerate(body2):
        place_line(page, line, MARGIN_X, base)
        base = R1(base + step)
    payload = encode_payload(FONTS, [page.to_dict()])
    return payload, golden_from_blocks([heading, body1, body2])


def build_multi_page(rng: random.Random):
    """3 pages; hyphenated word crossing the page boundary."""
    pages = []
    all_paragraphs: List[List[List[str]]] = []
    carry = None
    for page_num in (1, 2, 3):
        page = _PageBuilder(page_num)
        paragraphs = [make_lines(rng, rng.randint(2, 3)) for _ in range(2)]
        if page_num == 1:
            # hyphenate the very last word of page 1 (crosses page boundary,
            # but stays inside the same *intended* paragraph? no — blocks
            # split at page bounds here, so the merge crosses blocks).
            last_line = paragraphs[-1][-1]
            last = last_line[-1]
            shorter = next((w for w in WORD_POOL if len(w) == len(last) - 1),
                           last[:-1])
            last_line[-1] = shorter + "-"
        _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
        pages.append(page.to_dict())
        all_paragraphs.extend(paragraphs)
    payload = encode_payload(FONTS, pages)
    return payload, golden_from_blocks(all_paragraphs)


def build_degenerate(rng: random.Random):
    """Edge handling: a page with zero chars plus whitespace-only chars."""
    page1 = _PageBuilder(1)  # empty page
    page2 = _PageBuilder(2)
    paragraphs = [make_lines(rng, 2)]
    _layout_paragraphs(page2, paragraphs, MARGIN_X, TOP_BASE)
    # whitespace chars (suppressed at decode: PdfParsing.cpp:229-245)
    place_word(page2, " ", MARGIN_X, 300.0)
    place_word(page2, " ", MARGIN_X + 10.0, 300.0)
    payload = encode_payload(FONTS, [page1.to_dict(), page2.to_dict()])
    return payload, golden_from_blocks(paragraphs)


def build_jumbo(rng: random.Random, n_pages: int = 12):
    """Oversized document for size-bucket salting / skew benchmarks."""
    pages = []
    all_paragraphs: List[List[List[str]]] = []
    for page_num in range(1, n_pages + 1):
        page = _PageBuilder(page_num)
        paragraphs = [make_lines(rng, 5) for _ in range(5)]
        _layout_paragraphs(page, paragraphs, MARGIN_X, TOP_BASE)
        pages.append(page.to_dict())
        all_paragraphs.extend(paragraphs)
    payload = encode_payload(FONTS, pages)
    return payload, golden_from_blocks(all_paragraphs)


FAMILY_BUILDERS: Dict[str, Callable[[random.Random], Tuple[bytes, str]]] = {
    "plain-1col": build_plain_1col,
    "two-col": build_two_col,
    "hyphenated": build_hyphenated,
    "diacritics": build_diacritics,
    "ligatures": build_ligatures,
    "charnames": build_charnames,
    "headings": build_headings,
    "multi-page": build_multi_page,
    "degenerate": build_degenerate,
}


def build_corpus(n_docs: int, families: Optional[List[str]] = None,
                 seed: int = 42, jumbo_every: int = 0) -> List[dict]:
    """Deterministic corpus rows matching the input_hint schema plus
    ``golden_text`` / ``family`` columns for verification."""
    import datetime

    families = families or list(FAMILY_BUILDERS)
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(n_docs):
        if jumbo_every and i % jumbo_every == jumbo_every - 1:
            family = "jumbo"
            rng = random.Random(seed * 1000003 + i)
            payload, golden = build_jumbo(rng)
        else:
            family = families[i % len(families)]
            rng = random.Random(seed * 1000003 + i)
            payload, golden = FAMILY_BUILDERS[family](rng)
        rows.append({
            "url": "https://fixture.test/%s/doc-%05d" % (family, i),
            "warc_ts": t0 + datetime.timedelta(seconds=i),
            "html": payload,
            "text": "",
            "lang": "en",
            "golden_text": golden,
            "family": family,
        })
    return rows
