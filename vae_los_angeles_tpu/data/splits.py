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
    """Shared KFold indices (reference vae_cross_modality_cv.py:549-551).

    Fold-level vmap needs uniform shapes; the production fold batching
    (`parallel.vmap_meta.fit_folds`, `POP_MASK_SIZES` default) pads every
    fold's rows to bucketed maxima with the TRUE sizes as dynamic masked
    arguments, so ALL folds — KFold's two uneven sizes included — ride ONE
    compiled program per family (``POP_MASK_SIZES=0`` restores the round-4
    exact-size grouping, at most two programs). Either way no
    padding/masking layer exists HERE: the indices stay sklearn-exact.
    """
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return list(kf.split(np.arange(n)))
