#!/usr/bin/env python3
"""Train the dense+output layers of the reference-architecture role net.

The reference ships its role model's architecture and vocabularies
(/root/reference/resources/models/2021-08-30_model-3K-documents/) but the
repo copy is missing the trained weight VALUES (variables/ contains only
the 4 KB variables.index; variables.data-* is absent), so they cannot be
ported.  This script freezes the embedding+LSTM backbone at the
deterministic seeded initialization (kernel/roles_net.frozen_backbone) and
trains only dense [271,256] relu + main_output [256,14] softmax — the
echo-state recipe — with numpy Adam on fixture-corpus blocks labeled by the
deterministic heuristic head (standing in for the reference's hand-labeled
3K-document corpus).

Deterministic: fixed seeds, fixed corpus, fixed epoch count.  Writes
pdftotext_plus_plus_spark/resources/role_net.npz (~290 KB: only the trained
layers; the backbone is regenerated from its seed at load).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclasses import replace

from pdftotext_plus_plus_spark import fixtures, pipeline
from pdftotext_plus_plus_spark.config import DEFAULT_CONFIG, SEMANTIC_ROLE_NAMES
from pdftotext_plus_plus_spark.kernel import roles_net

N_DOCS = 400
EPOCHS = 4000
LR = 1e-3
SEED = 13


# Every training seed is DISJOINT from every driver/oracle corpus seed:
# the driver registry and all driver-query corpora use build_corpus's
# default seed 42 (per-doc rng = seed*1000003 + i), and the held-out
# evaluation below uses seed 101 — no training document is identical to
# any document the driver oracles or the held-out gate ever see.
TRAIN_SPECS = (("article-roles", 300, 7), ("figures", 150, 8),
               ("subsuper", 80, 9), ("headings", 80, 10),
               ("mixed-two-col", 60, 11), ("article-roles", 150, 23))
BASE_SEED = 5
HELDOUT_SEED = 101
HELDOUT_DOCS = 200
HELDOUT_MIN_ACC = 0.95


def _rows_to_xy(rows, cfg, role_to_id):
    xs, ys = [], []
    for row in rows:
        res = pipeline.extract(row["html"], config=cfg, keep_doc=True)
        feats = roles_net.block_features(res.doc)
        labels = [b.role for p in res.doc.pages for b in p.blocks]
        assert feats.shape[0] == len(labels)
        xs.append(feats)
        ys.extend(role_to_id[r] for r in labels)
    return np.concatenate(xs, axis=0), np.asarray(ys, dtype=np.int64)


def build_dataset():
    cfg = replace(DEFAULT_CONFIG, skip_semantic_roles=False)
    role_to_id = {r: i for i, r in enumerate(SEMANTIC_ROLE_NAMES)}
    rows = fixtures.build_corpus(N_DOCS, seed=BASE_SEED, jumbo_every=25)
    # oversample the families carrying the rare classes (heading, caption,
    # footnote, title, author-info) so they are not drowned by paragraphs
    for fam, n, seed in TRAIN_SPECS:
        rows.extend(fixtures.build_corpus(n, families=[fam], seed=seed))
    return _rows_to_xy(rows, cfg, role_to_id)


def build_heldout():
    """Unseen article-roles docs (seed disjoint from training AND from the
    driver registry) labeled by the heuristic head — the generalization
    gate demanded by the round-2 verdict."""
    cfg = replace(DEFAULT_CONFIG, skip_semantic_roles=False)
    role_to_id = {r: i for i, r in enumerate(SEMANTIC_ROLE_NAMES)}
    rows = fixtures.build_corpus(HELDOUT_DOCS, families=["article-roles"],
                                 seed=HELDOUT_SEED)
    return _rows_to_xy(rows, cfg, role_to_id)


def train(x: np.ndarray, y: np.ndarray):
    rng = np.random.RandomState(SEED)
    n, d = x.shape
    h, k = 256, len(SEMANTIC_ROLE_NAMES)
    dense_w = rng.normal(0, np.sqrt(2.0 / d), size=(d, h))
    dense_b = np.zeros(h)
    out_w = rng.normal(0, np.sqrt(2.0 / h), size=(h, k))
    out_b = np.zeros(k)
    params = [dense_w, dense_b, out_w, out_b]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    onehot = np.zeros((n, k))
    onehot[np.arange(n), y] = 1.0
    # sqrt-inverse-frequency class weights: lift the rare roles without
    # drowning the majority class (full inverse overfits caption/heading)
    counts = np.bincount(y, minlength=k).astype(np.float64)
    cw = np.where(counts > 0, np.sqrt(counts.max() / np.maximum(counts, 1)),
                  0.0)
    cw = cw / cw[y].mean()
    sample_w = cw[y][:, None]
    t = 0
    for epoch in range(EPOCHS):
        hid_pre = x @ dense_w + dense_b
        hid = np.maximum(hid_pre, 0.0)
        logits = hid @ out_w + out_b
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        if epoch % 250 == 0:
            loss = -np.log(probs[np.arange(n), y] + 1e-12).mean()
            acc = (probs.argmax(axis=1) == y).mean()
            print(f"epoch {epoch:4d}  loss {loss:.4f}  acc {acc:.4f}")
        dlogits = sample_w * (probs - onehot) / n
        grads = [
            x.T @ ((dlogits @ out_w.T) * (hid_pre > 0)),
            ((dlogits @ out_w.T) * (hid_pre > 0)).sum(axis=0),
            hid.T @ dlogits,
            dlogits.sum(axis=0),
        ]
        t += 1
        for p, g, mi, vi in zip(params, grads, m, v):
            mi += (1 - 0.9) * (g - mi)
            vi += (1 - 0.999) * (g * g - vi)
            mhat = mi / (1 - 0.9 ** t)
            vhat = vi / (1 - 0.999 ** t)
            p -= LR * mhat / (np.sqrt(vhat) + 1e-8)
    acc = (probs.argmax(axis=1) == y).mean()
    print("final acc:", acc)
    return params, acc


def main():
    x, y = build_dataset()
    print("dataset:", x.shape, "labels:", np.bincount(y, minlength=14))
    (dense_w, dense_b, out_w, out_b), acc = train(x, y)
    assert acc > 0.97, acc
    # held-out generalization gate: unseen article-roles docs
    hx, hy = build_heldout()
    hid = np.maximum(hx @ dense_w + dense_b, 0.0)
    pred = (hid @ out_w + out_b).argmax(axis=1)
    h_acc = (pred == hy).mean()
    print(f"held-out acc (seed {HELDOUT_SEED}, {HELDOUT_DOCS} docs):", h_acc)
    assert h_acc >= HELDOUT_MIN_ACC, h_acc
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "pdftotext_plus_plus_spark/resources/role_net.npz")
    np.savez_compressed(out, dense_w=dense_w, dense_b=dense_b,
                        out_w=out_w, out_b=out_b)
    print("wrote", out)


if __name__ == "__main__":
    main()
