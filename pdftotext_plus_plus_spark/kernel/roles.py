"""T15 — semantic-role prediction surface.

The reference feeds each block into a tiny Keras net with two inputs
(/root/reference/src/SemanticRolesPrediction.cpp:130-404):

* a 15-dim layout feature vector (createLayoutInputTensor, :171-369) —
  replicated here exactly in :func:`compute_layout_features`;
* 100 BPE token ids of the block text (createWordsInputTensor, :372-404;
  encoder /root/reference/src/utils/BytePairEncoder.cpp:32-216) — the
  encoder is replicated in :class:`BytePairEncoder` (greedy
  first-matching-pair merging in occurrence order, ✂ word delimiter,
  pad/truncate to the target length).

Two classifier heads sit behind the same skip flag the reference exposes
(--skip-semantic-roles-prediction, pdftotext++.cpp:663; with the stage
skipped, every block keeps the default PARAGRAPH role exactly like the
reference):

* ``role_head="heuristic"`` — a deterministic rule head over the same
  layout features;
* ``role_head="model"`` — the reference's exact model architecture
  (embedding -> LSTM over the shipped bpe-vocab.tsv ids, concat 15 layout
  dims -> dense relu -> softmax over the 14-role enum) replicated in numpy
  (:mod:`.roles_net`).  The reference repo copy ships the architecture and
  vocabularies but NOT the trained weight values (variables.data-* is
  absent), so the backbone is frozen at a seeded init and the output layers
  are trained on the fixture corpus (scripts/train_reference_role_net.py).
"""

from __future__ import annotations

from typing import Dict, List

from ..config import PipelineConfig
from ..model import Block, Doc

PADDING_SYMBOL = "⊛"
UNKNOWN_CHAR_SYMBOL = "⌾"
WORD_DELIM_SYMBOL = "✂"

WORD_DELIMITERS = " \t\r\n\f\v"


def split_into_words(text: str, delimiters: str = WORD_DELIMITERS) -> List[str]:
    """TextUtils.cpp:33-49 semantics (find_first_not_of / find_first_of)."""
    words = []
    current = []
    for ch in text:
        if ch in delimiters:
            if current:
                words.append("".join(current))
                current = []
        else:
            current.append(ch)
    if current:
        words.append("".join(current))
    return words


class BytePairEncoder:
    """Greedy BPE with first-matching-pair merging (BytePairEncoder.cpp)."""

    def __init__(self, vocabulary: Dict[str, int]):
        self.vocab = dict(vocabulary)
        for symbol in (PADDING_SYMBOL, UNKNOWN_CHAR_SYMBOL, WORD_DELIM_SYMBOL):
            if symbol not in self.vocab:
                self.vocab[symbol] = len(self.vocab)
        self._cache: Dict[str, List[int]] = {}

    def encode(self, text: str, target_length: int) -> List[int]:
        result: List[int] = []
        for word in split_into_words(text):
            if not word:
                continue
            result.extend(self._encode_word(word + WORD_DELIM_SYMBOL))
        if target_length > 0:
            pad = self.vocab[PADDING_SYMBOL]
            while len(result) < target_length:
                result.append(pad)
            del result[target_length:]
        return result

    def _encode_word(self, word: str) -> List[int]:
        if not word:
            return []
        cached = self._cache.get(word)
        if cached is not None:
            return list(cached)

        tokens = list(word)
        if len(tokens) == 1:
            return [self.vocab.get(word, self.vocab[UNKNOWN_CHAR_SYMBOL])]

        while len(tokens) > 1:
            # token pairs in first-occurrence order with their positions
            pair_positions: Dict[str, List[int]] = {}
            order: List[str] = []
            for i in range(1, len(tokens)):
                merged = tokens[i - 1] + tokens[i]
                if merged in pair_positions:
                    pair_positions[merged].append(i - 1)
                else:
                    pair_positions[merged] = [i - 1]
                    order.append(merged)
            # the FIRST pair (by occurrence order) found in the vocabulary
            match = next((p for p in order if p in self.vocab), None)
            if match is None:
                break
            positions = set(pair_positions[match])
            new_tokens: List[str] = []
            i = 0
            while i < len(tokens):
                if i in positions:
                    new_tokens.append(tokens[i] + tokens[i + 1])
                    i += 2
                else:
                    new_tokens.append(tokens[i])
                    i += 1
            tokens = new_tokens

        unknown = self.vocab[UNKNOWN_CHAR_SYMBOL]
        encoding = [self.vocab.get(t, unknown) for t in tokens]
        self._cache[word] = encoding
        return list(encoding)


def compute_layout_features(doc: Doc) -> List[List[float]]:
    """The 15-dim per-block layout vector, mirroring
    createLayoutInputTensor (SemanticRolesPrediction.cpp:171-369)."""
    min_fs = float("inf")
    max_fs = float("-inf")
    n_blocks = 0
    for page in doc.pages:
        for block in page.blocks:
            min_fs = min(min_fs, block.font_size)
            max_fs = max(max_fs, block.font_size)
            n_blocks += 1
    if n_blocks == 0:
        return []

    features: List[List[float]] = []
    n_pages = len(doc.pages)
    for page in doc.pages:
        page_w = page.width
        page_h = page.height
        for block in page.blocks:
            font = doc.font_infos.get(block.font_name)
            text = block.text

            page_num_enc = ((block.page_num - 1) / (n_pages - 1)
                            if n_pages > 1 else 0.0)
            left_x_enc = block.left_x / page_w if page_w > 0 else 0.0
            # the model expects a lower-left origin
            upper_y_enc = (page_h - block.lower_y) / page_h if page_h > 0 else 0.0
            right_x_enc = block.right_x / page_w if page_w > 0 else 0.0
            lower_y_enc = (page_h - block.upper_y) / page_h if page_h > 0 else 0.0
            fs_enc = ((block.font_size - min_fs) / (max_fs - min_fs)
                      if min_fs < max_fs else 0.0)
            is_bold = 1.0 if font is not None and font.weight > 500 else 0.0
            is_italic = 1.0 if font is not None and font.is_italic else 0.0
            contains_at = 1.0 if "@" in text else 0.0
            starts_digit = 1.0 if text and text[0].isdigit() else 0.0

            n_digits = n_upper = n_non_ascii = n_punct = n_non_ws = 0
            for ch in text:
                if ch.isdigit():
                    n_digits += 1
                if ch.isupper():
                    n_upper += 1
                if ord(ch) > 127:
                    n_non_ascii += 1
                if _iswpunct(ch):
                    n_punct += 1
                if not ch.isspace():
                    n_non_ws += 1

            n_words = 0
            n_upper_words = 0
            for line in block.lines:
                for word in line.words:
                    if word.text and word.text[0].isupper():
                        n_upper_words += 1
                    n_words += 1

            denom = n_non_ws if n_non_ws > 0 else 1
            features.append([
                page_num_enc, left_x_enc, upper_y_enc, right_x_enc,
                lower_y_enc, fs_enc, is_bold, is_italic, contains_at,
                starts_digit,
                n_digits / denom if n_non_ws else 0.0,
                n_non_ascii / denom if n_non_ws else 0.0,
                n_punct / denom if n_non_ws else 0.0,
                n_upper_words / n_words if n_words else 0.0,
                n_upper / denom if n_non_ws else 0.0,
            ])
    return features


def _iswpunct(ch: str) -> bool:
    import unicodedata
    if ch.isascii():
        return 33 <= ord(ch) <= 126 and not ch.isalnum()
    return unicodedata.category(ch).startswith("P")


def predict_roles_model(doc: Doc) -> None:
    """Model-based role head: the reference's exact architecture (words
    BPE ids -> embedding -> LSTM, concat 15 layout dims -> dense relu ->
    softmax over the 14-role enum) with the SHIPPED bpe/roles vocabularies,
    replicated in numpy — see kernel/roles_net.py for the full provenance
    (the reference repo copy ships the architecture + vocabs but not the
    trained weight values).  Loads once per executor process
    (SemanticRolesPrediction.cpp:133-135); ships via --py-files."""
    from . import roles_net

    roles_net.predict_roles_net(doc)


def predict_roles(doc: Doc, config: PipelineConfig) -> None:
    """Role-prediction stage dispatch: ``config.role_head`` selects the
    deterministic heuristic (default) or the trained numpy model head.
    """
    if getattr(config, "role_head", "heuristic") == "model":
        predict_roles_model(doc)
        return
    _predict_roles_heuristic(doc, config)


def _predict_roles_heuristic(doc: Doc, config: PipelineConfig) -> None:
    """Deterministic heuristic classifier head (stand-in for the TF model;
    see module docstring).  Assigns title/heading/footnote/caption/
    author-info/paragraph from the same layout features the model consumes.
    """
    from .blocks import _BlocksDetector

    detector = _BlocksDetector(doc, config)
    max_fs = 0.0
    for page in doc.pages:
        for block in page.blocks:
            max_fs = max(max_fs, block.font_size)

    title_assigned = False
    for page in doc.pages:
        figures = page.figures
        for block in page.blocks:
            emphasized = detector._is_emphasized(block)
            first_line = block.lines[0] if block.lines else None
            if "@" in block.text:
                block.role = "author-info"
                continue
            if (not title_assigned and page.page_num == 1 and emphasized
                    and block.font_size >= max_fs - config.fs_equal_tolerance
                    and block.font_size > doc.most_freq_font_size
                    + config.fs_equal_tolerance):
                block.role = "title"
                title_assigned = True
                continue
            if emphasized and block.font_size > doc.most_freq_font_size \
                    + config.fs_equal_tolerance:
                block.role = "heading"
                continue
            if (first_line is not None
                    and detector._is_prefixed_by_footnote_label(first_line, None)):
                block.role = "footnote"
                continue
            if figures and detector._overlaps_figure(block, figures) is not None:
                block.role = "caption"
                continue
            block.role = "paragraph"
