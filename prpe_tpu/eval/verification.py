"""Face-identity metrics.

The reference reports top-1 classification accuracy over the 85,742-identity
logits (reference: training/lightning/face_recognition/module.py:111-145).
The BASELINE north star additionally asks for *verification accuracy* (the
standard LFW-style protocol the AdaFace paper reports): pairs of embeddings,
cosine threshold chosen by k-fold cross-validation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return (a * b).sum(-1)


def best_threshold_accuracy(
    scores: np.ndarray, same: np.ndarray, thresholds: np.ndarray
) -> Tuple[float, float]:
    accs = [( (scores >= t) == same ).mean() for t in thresholds]
    i = int(np.argmax(accs))
    return float(accs[i]), float(thresholds[i])


def verification_accuracy(
    emb_a: np.ndarray,
    emb_b: np.ndarray,
    same: np.ndarray,
    n_folds: int = 10,
) -> Dict[str, float]:
    """K-fold verification accuracy with per-fold threshold selection on the
    train folds (the published LFW protocol).

    Args:
      emb_a, emb_b: (N, D) embedding pairs.
      same: (N,) bool — same identity.

    Returns {accuracy, accuracy_std, threshold}.
    """
    scores = cosine_similarity(emb_a, emb_b)
    same = np.asarray(same, bool)
    n = len(scores)
    # fewer pairs than folds would produce empty test folds (NaN fold means);
    # clamp, degenerating to leave-one-out for tiny pair sets
    n_folds = max(1, min(n_folds, n))
    idx = np.arange(n)
    folds = np.array_split(idx, n_folds)
    thresholds = np.linspace(-1.0, 1.0, 401)

    accs, thrs = [], []
    for k in range(n_folds):
        test = folds[k]
        others = [folds[j] for j in range(n_folds) if j != k]
        # single-fold degenerate case: fit the threshold on the test fold
        train = np.concatenate(others) if others else test
        _, thr = best_threshold_accuracy(scores[train], same[train], thresholds)
        accs.append(((scores[test] >= thr) == same[test]).mean())
        thrs.append(thr)
    return {
        "accuracy": float(np.mean(accs)),
        "accuracy_std": float(np.std(accs)),
        "threshold": float(np.mean(thrs)),
    }


def top1_accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    return float((logits.argmax(-1) == labels).mean())
