"""Split protocol shared by every entry point.

Every script in the reference re-derives the identical 80/20 split with
``train_test_split(test_size=0.2, random_state=42)`` (SURVEY §1 cross-layer
conventions; reference train_rna2dna.py:43-47, downstream_task.py:408-412,
run_comparison.py:243-247). Exact split parity matters for Pearson-r parity
(SURVEY hard-part #3), so we delegate the permutation to sklearn itself and
return **index arrays** that the HBM-resident dataset gathers from.
"""

from __future__ import annotations

import numpy as np
from sklearn.model_selection import KFold, train_test_split


def train_val_indices(n: int, test_size: float = 0.2, seed: int = 42):
    """Index-level equivalent of the reference's df-level train_test_split."""
    idx = np.arange(n)
    train_idx, val_idx = train_test_split(idx, test_size=test_size, random_state=seed)
    return train_idx, val_idx


def kfold_indices(n: int, n_splits: int, seed: int = 42):
    """Shared KFold indices (reference vae_cross_modality_cv.py:549-551)."""
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return list(kf.split(np.arange(n)))


def padded_kfold_indices(n: int, n_splits: int, seed: int = 42):
    """KFold indices padded to uniform shapes for fold-level vmap.

    Returns (train_idx, train_mask, val_idx, val_mask), each shaped
    (n_splits, max_len). Padding repeats index 0 with mask=False.

    NOTE: no engine path consumes the masks — the production fold batching
    (`parallel.vmap_meta.fit_folds`) instead GROUPS folds by exact
    (train, val) sizes, which needs no masking at all (KFold yields at most
    two distinct sizes). Feeding the padded indices into the unmasked engine
    would double-count sample 0; a consumer of this helper must apply the
    masks itself in its loss/metric reductions.
    """
    folds = kfold_indices(n, n_splits, seed)
    max_tr = max(len(tr) for tr, _ in folds)
    max_va = max(len(va) for _, va in folds)

    def pad(idx, length):
        mask = np.zeros(length, dtype=bool)
        mask[: len(idx)] = True
        out = np.zeros(length, dtype=np.int32)
        out[: len(idx)] = idx
        return out, mask

    tr_idx = np.zeros((n_splits, max_tr), np.int32)
    tr_mask = np.zeros((n_splits, max_tr), bool)
    va_idx = np.zeros((n_splits, max_va), np.int32)
    va_mask = np.zeros((n_splits, max_va), bool)
    for i, (tr, va) in enumerate(folds):
        tr_idx[i], tr_mask[i] = pad(tr, max_tr)
        va_idx[i], va_mask[i] = pad(va, max_va)
    return tr_idx, tr_mask, va_idx, va_mask
