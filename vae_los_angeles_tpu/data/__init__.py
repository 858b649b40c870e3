"""Data layer: HBM-resident dataset, split protocol, synthetic generator,
data-prep pipelines."""

from vae_los_angeles_tpu.data.dataset import (  # noqa: F401
    MultiModalArrays,
    MultiModalDataset,
    batch_indices,
    load_label_encoder,
)
from vae_los_angeles_tpu.data.splits import (  # noqa: F401
    kfold_indices,
    train_val_indices,
)

__all__ = [
    "MultiModalArrays",
    "MultiModalDataset",
    "batch_indices",
    "kfold_indices",
    "load_label_encoder",
    "train_val_indices",
]
