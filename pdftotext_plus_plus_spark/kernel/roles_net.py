"""T15 — the reference's role-model architecture, replicated in numpy.

Architecture recovered from the shipped SavedModel graph
(/root/reference/resources/models/2021-08-30_model-3K-documents/
saved_model.pb, VarHandleOp shapes):

    words_input [B,100] -> embedding [2259,256]
      -> LSTM(256)   (Keras gate order i|f|c|o, sigmoid recurrent
                      activation, tanh activation, last hidden state)
    concat(h_T, layout_features [15]) = 271
      -> dense [271,256] relu -> main_output [256,14] softmax

Inference semantics mirror SemanticRolesPrediction.cpp:130-168: the output
argmax (strict ``>`` starting from prob 0, so the FIRST maximum wins ties)
indexes the SemanticRole enum (Types.h:69-84, which equals the shipped
roles-vocab.tsv order).  The words input is the block text encoded with the
reference's SHIPPED bpe-vocab.tsv (2256 entries + PADDING/UNKNOWN/WORD_DELIM
meta symbols appended in that order, BytePairEncoder.cpp:31-38 -> 2259 rows
= the embedding height), padded/truncated to 100
(createWordsInputTensor, SemanticRolesPrediction.cpp:372-404).

The reference repo copy ships only the variables INDEX
(variables/variables.index, 4 KB); the trained weight values
(variables.data-*) are absent, so they cannot be ported.  The embedding and
LSTM are therefore frozen at a deterministic seeded initialization
(regenerated at load from BACKBONE_SEED — echo-state style, nothing stored)
and the dense + output layers are trained by
scripts/train_reference_role_net.py on the fixture corpus against the
heuristic head's labels (standing in for the reference's hand-labeled
3K-document corpus).  Everything architectural — vocab, ids, tensor shapes,
gate math, argmax/enum mapping — matches the reference exactly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..config import SEMANTIC_ROLE_NAMES
from ..model import Doc

EMB_DIM = 256
LSTM_UNITS = 256
WORD_SEQ_LENGTH = 100  # model-args.json: word_seq_length
N_LAYOUT = 15
BACKBONE_SEED = 20210830  # the model directory's date stamp

_CACHE: Dict[str, object] = {}


def _read_resource(name: str) -> bytes:
    from importlib import resources

    return (resources.files("pdftotext_plus_plus_spark")
            .joinpath("resources/" + name).read_bytes())


def load_bpe_vocab() -> Dict[str, int]:
    """The shipped bpe-vocab.tsv (token \\t id per line)."""
    if "bpe" not in _CACHE:
        vocab: Dict[str, int] = {}
        for line in _read_resource("bpe-vocab.tsv").decode("utf-8").splitlines():
            tab = line.find("\t")
            if tab < 0:
                continue
            vocab[line[:tab]] = int(line[tab + 1:])
        _CACHE["bpe"] = vocab
    return dict(_CACHE["bpe"])  # BytePairEncoder mutates (adds meta symbols)


def load_roles_vocab() -> List[str]:
    """The shipped roles-vocab.tsv; order equals the SemanticRole enum."""
    if "roles" not in _CACHE:
        roles: Dict[int, str] = {}
        for line in _read_resource("roles-vocab.tsv").decode("utf-8").splitlines():
            tab = line.find("\t")
            if tab < 0:
                continue
            roles[int(line[tab + 1:])] = line[:tab]
        out = [roles[i] for i in range(len(roles))]
        assert tuple(out) == SEMANTIC_ROLE_NAMES, out
        _CACHE["roles"] = out
    return list(_CACHE["roles"])


def frozen_backbone() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic embedding + LSTM weights (regenerated, never stored).

    Scaled-normal embedding; LSTM kernels orthogonalized per gate (the
    standard echo-state recipe keeps the recurrent dynamics stable); forget
    -gate bias 1.0 (the Keras unit_forget_bias default)."""
    if "backbone" in _CACHE:
        return _CACHE["backbone"]
    rng = np.random.default_rng(BACKBONE_SEED)
    emb = rng.normal(0.0, 0.05, size=(2259, EMB_DIM))
    def ortho(rows, cols):
        m = rng.normal(size=(max(rows, cols), max(rows, cols)))
        q, _ = np.linalg.qr(m)
        return q[:rows, :cols]
    w = np.concatenate([ortho(EMB_DIM, LSTM_UNITS) for _ in range(4)], axis=1)
    u = np.concatenate([ortho(LSTM_UNITS, LSTM_UNITS) for _ in range(4)],
                       axis=1)
    b = np.zeros(4 * LSTM_UNITS)
    b[LSTM_UNITS:2 * LSTM_UNITS] = 1.0  # forget gate
    _CACHE["backbone"] = (emb, w, u, b)
    return _CACHE["backbone"]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def lstm_last_hidden(ids: np.ndarray) -> np.ndarray:
    """Run the Keras-semantics LSTM over [B, T] token ids; return h_T."""
    emb, w, u, b = frozen_backbone()
    x = emb[ids]                       # [B, T, E]
    n, t, _ = x.shape
    h = np.zeros((n, LSTM_UNITS))
    c = np.zeros((n, LSTM_UNITS))
    k = LSTM_UNITS
    for step in range(t):
        z = x[:, step, :] @ w + h @ u + b
        i = _sigmoid(z[:, :k])
        f = _sigmoid(z[:, k:2 * k])
        g = np.tanh(z[:, 2 * k:3 * k])
        o = _sigmoid(z[:, 3 * k:])
        c = f * c + i * g
        h = o * np.tanh(c)
    return h


def words_input(doc: Doc) -> np.ndarray:
    """[n_blocks, 100] BPE ids of each block's text, shipped vocab
    (createWordsInputTensor, SemanticRolesPrediction.cpp:372-404)."""
    from .roles import BytePairEncoder

    if "encoder" not in _CACHE:
        _CACHE["encoder"] = BytePairEncoder(load_bpe_vocab())
    encoder: BytePairEncoder = _CACHE["encoder"]
    rows = []
    for page in doc.pages:
        for block in page.blocks:
            rows.append(encoder.encode(block.text, WORD_SEQ_LENGTH))
    return np.asarray(rows, dtype=np.int64).reshape(-1, WORD_SEQ_LENGTH)


def _load_head():
    if "head" not in _CACHE:
        import io

        data = np.load(io.BytesIO(_read_resource("role_net.npz")))
        _CACHE["head"] = (data["dense_w"], data["dense_b"],
                          data["out_w"], data["out_b"])
    return _CACHE["head"]


def block_features(doc: Doc) -> np.ndarray:
    """[n_blocks, 271] = concat(LSTM h_T over BPE ids, 15 layout dims)."""
    from .roles import compute_layout_features

    layout = np.asarray(compute_layout_features(doc), dtype=np.float64)
    if layout.size == 0:
        return np.zeros((0, LSTM_UNITS + N_LAYOUT))
    h = lstm_last_hidden(words_input(doc))
    return np.concatenate([h, layout], axis=1)


def predict_roles_net(doc: Doc) -> None:
    """Forward pass + the reference's argmax (first max wins,
    SemanticRolesPrediction.cpp:151-167) into the SemanticRole enum order."""
    feats = block_features(doc)
    if feats.shape[0] == 0:
        return
    dense_w, dense_b, out_w, out_b = _load_head()
    hidden = np.maximum(feats @ dense_w + dense_b, 0.0)          # relu
    logits = hidden @ out_w + out_b
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)                     # softmax
    roles = load_roles_vocab()
    # maxProb starts at 0 and comparison is strict ">": first max wins
    pred = probs.argmax(axis=1)
    i = 0
    for page in doc.pages:
        for block in page.blocks:
            block.role = roles[int(pred[i])]
            i += 1
