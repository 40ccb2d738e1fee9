#!/usr/bin/env python3
"""Train the semantic-role classifier head (T15 model stand-in).

The reference ships a tiny Keras net over 15 layout features + 100 BPE ids
(/root/reference/src/SemanticRolesPrediction.cpp). Its trained weights are
not portable here (TensorFlow absent), so this script trains a multinomial
logistic-regression head in pure numpy over the SAME 15-dim layout features,
using the deterministic heuristic role head as the labeling function on the
fixture corpus (provenance: the heuristic stands in for the reference's
hand-labeled training corpus — what matters architecturally is the
model-inference plumbing: features -> broadcast weights -> argmax).

Deterministic: fixed seed, fixed corpus, fixed iteration count.  Writes
pdftotext_plus_plus_spark/resources/role_head.npz.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclasses import replace

from pdftotext_plus_plus_spark import fixtures, pipeline
from pdftotext_plus_plus_spark.config import DEFAULT_CONFIG, SEMANTIC_ROLE_NAMES
from pdftotext_plus_plus_spark.kernel.roles import compute_layout_features

N_DOCS = 400
ITERATIONS = 600
LR = 0.5
SEED = 13


def build_dataset():
    cfg = replace(DEFAULT_CONFIG, skip_semantic_roles=False)
    xs, ys = [], []
    rows = fixtures.build_corpus(N_DOCS, jumbo_every=25)
    role_to_id = {r: i for i, r in enumerate(SEMANTIC_ROLE_NAMES)}
    for row in rows:
        res = pipeline.extract(row["html"], config=cfg, keep_doc=True,
                               with_spans=True)
        feats = compute_layout_features(res.doc)
        labels = [b.role for p in res.doc.pages for b in p.blocks]
        assert len(feats) == len(labels)
        for f, label in zip(feats, labels):
            xs.append(f)
            ys.append(role_to_id[label])
    return np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.int64)


def train(x: np.ndarray, y: np.ndarray):
    rng = np.random.RandomState(SEED)
    n, d = x.shape
    k = len(SEMANTIC_ROLE_NAMES)
    w = rng.normal(0, 0.01, size=(d, k))
    b = np.zeros(k)
    onehot = np.zeros((n, k))
    onehot[np.arange(n), y] = 1.0
    # class weights: the corpus is paragraph-dominated
    counts = onehot.sum(axis=0) + 1.0
    cls_w = (n / counts) / (n / counts).sum() * k
    sample_w = cls_w[y][:, None]
    for it in range(ITERATIONS):
        logits = x @ w + b
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        grad = (p - onehot) * sample_w / n
        w -= LR * (x.T @ grad + 1e-4 * w)
        b -= LR * grad.sum(axis=0)
    pred = (x @ w + b).argmax(axis=1)
    acc = float((pred == y).mean())
    return w, b, acc


def main() -> None:
    x, y = build_dataset()
    print(f"dataset: {x.shape[0]} blocks, label distribution: "
          f"{np.bincount(y, minlength=len(SEMANTIC_ROLE_NAMES)).tolist()}")
    w, b, acc = train(x, y)
    print(f"train accuracy vs heuristic labels: {acc:.4f}")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pdftotext_plus_plus_spark",
        "resources", "role_head.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, weights=w, bias=b,
             roles=np.array(SEMANTIC_ROLE_NAMES))
    print("saved", out)


if __name__ == "__main__":
    main()
