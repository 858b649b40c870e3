"""HBM-resident multi-modal dataset.

The reference's ``MultiModalDataset`` (src/data/dataset.py:10-51) materializes
pandas list-columns into dense numpy arrays and then feeds them to a
DataLoader one 32-row batch at a time, paying a host→device copy per tensor
per batch (train_rna2dna.py:83). Here the whole table is staged to device HBM
**once** (`to_device`); epochs run as a `lax.scan` over a shuffled index
permutation with zero host round-trips (SURVEY §2.3 "multi-process data
loading" row).

Schema (reference scripts/prepare_data.py:121-131):
  tpm_unstranded: list[float], log1p'd RNA TPM      → ``tpm``  (n, dim_a) f32
  beta_value:     list[float] in [0,1], methylation → ``beta`` (n, dim_b) f32
  primary_site_encoded: int label                   → ``site`` (n,) i32
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MultiModalArrays(NamedTuple):
    """Dense modality arrays; device-resident after `to_device`."""

    tpm: jnp.ndarray  # (n, dim_a) float32, log1p'd RNA TPM
    beta: jnp.ndarray  # (n, dim_b) float32, methylation β-values
    site: jnp.ndarray  # (n,) int32, encoded primary site

    def __len__(self):
        return self.tpm.shape[0]

    def take(self, idx) -> "MultiModalArrays":
        idx = np.asarray(idx) if isinstance(idx, (list, np.ndarray)) else idx
        return MultiModalArrays(
            tpm=self.tpm[idx], beta=self.beta[idx], site=self.site[idx]
        )


class MultiModalDataset:
    """Dataset over the processed-data schema.

    Construct from a pandas DataFrame (`MultiModalDataset(df)`), from dense
    arrays (`from_numpy`), or from the pickle artifact
    (`from_pickle('data/processed_data.pkl')`).
    """

    def __init__(self, dataframe):
        self.tpm_data = np.array(dataframe["tpm_unstranded"].tolist()).astype(
            np.float32
        )
        self.beta_data = np.array(dataframe["beta_value"].tolist()).astype(np.float32)
        self.primary_site = np.array(dataframe["primary_site_encoded"]).astype(
            np.int32
        )
        # the source table's list-columns (boxed Python floats, ~8-10× the
        # dense footprint) are NOT retained — nothing reads them after the
        # densification above

    def __len__(self):
        return len(self.tpm_data)

    def __getitem__(self, idx):
        return self.tpm_data[idx], self.beta_data[idx], self.primary_site[idx]

    @classmethod
    def from_numpy(cls, tpm_data, beta_data, primary_site) -> "MultiModalDataset":
        obj = cls.__new__(cls)
        obj.tpm_data = np.asarray(tpm_data, dtype=np.float32)
        obj.beta_data = np.asarray(beta_data, dtype=np.float32)
        obj.primary_site = np.asarray(primary_site, dtype=np.int32)
        return obj

    @classmethod
    def from_pickle(cls, path) -> "MultiModalDataset":
        import pandas as pd

        return cls(pd.read_pickle(path))

    def to_device(self) -> MultiModalArrays:
        """Stage the full table into HBM once (multi-chip layouts are applied
        downstream: engine.fit(mesh=...) / parallel.sharding.shard_arrays)."""
        return MultiModalArrays(
            tpm=jnp.asarray(self.tpm_data),
            beta=jnp.asarray(self.beta_data),
            site=jnp.asarray(self.primary_site),
        )


def batch_indices(
    key,
    n: int,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
) -> jnp.ndarray:
    """Per-epoch batch index matrix (n_batches, batch_size).

    `drop_last=True` mirrors the reference train loader
    (train_rna2dna.py:57-62); with shuffle the permutation is threefry-derived
    so epochs are reproducible under jit.

    CAVEAT (`drop_last=False`): a fixed-shape matrix cannot express torch's
    short final batch, so the last batch WRAPS AROUND and re-uses leading
    indices of the permutation (tiling it when n < batch_size) — those
    samples appear more than once in the epoch. Consumers needing exact
    torch remainder semantics should use ``training.engine`` (which runs a
    true short remainder batch and keeps its own drop_last=True permutation
    inline in run_epoch) rather than this helper.
    """
    if shuffle:
        perm = jax.random.permutation(key, n)
    else:
        perm = jnp.arange(n)
    if drop_last:
        n_batches = n // batch_size
        return perm[: n_batches * batch_size].reshape(n_batches, batch_size)
    n_batches = -(-n // batch_size)
    # jnp.resize tiles the permutation: a single pad slice perm[:pad] would
    # come up short (and crash the reshape) whenever n < pad
    return jnp.resize(perm, (n_batches * batch_size,)).reshape(
        n_batches, batch_size
    )


def load_label_encoder(path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
