"""Data-layer tests: split-protocol parity, synthetic schema, batching,
sharded-input training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import (
    MultiModalArrays,
    MultiModalDataset,
    batch_indices,
)
from vae_los_angeles_tpu.data.splits import kfold_indices, train_val_indices
from vae_los_angeles_tpu.data.synthetic import (
    generate_synthetic_arrays,
    make_dataframe,
    write_synthetic_artifacts,
)


def test_split_protocol_matches_reference():
    """Index split == the reference's df-level train_test_split(seed 42)."""
    n = 503
    df = pd.DataFrame({"x": np.arange(n)})
    ref_train, ref_val = train_test_split(df, test_size=0.2, random_state=42)
    tr_idx, va_idx = train_val_indices(n)
    np.testing.assert_array_equal(np.sort(ref_train.index.values), np.sort(tr_idx))
    np.testing.assert_array_equal(np.sort(ref_val.index.values), np.sort(va_idx))


def test_kfold_partitions_samples():
    folds = kfold_indices(103, 10)
    assert len(folds) == 10
    all_val = np.concatenate([va for _, va in folds])
    assert sorted(all_val.tolist()) == list(range(103))
    # at most two distinct fold sizes → vmap_meta groups them unpadded
    assert len({(len(tr), len(va)) for tr, va in folds}) <= 2


def test_synthetic_schema_roundtrip(tmp_path):
    df, le = write_synthetic_artifacts(
        str(tmp_path), n_samples=64, dim_a=12, dim_b=15, n_sites=4, n_unmatched=8
    )
    loaded = MultiModalDataset.from_pickle(str(tmp_path / "processed_data.pkl"))
    assert loaded.tpm_data.shape == (64, 12)
    assert loaded.beta_data.shape == (64, 15)
    assert loaded.beta_data.min() >= 0 and loaded.beta_data.max() <= 1
    # RNA is log1p'd → non-negative
    assert loaded.tpm_data.min() >= 0
    # unmatched RNA cohort ships RAW (pre-log1p) TPM
    rna_only = pd.read_pickle(tmp_path / "rna_only_unmatched.pkl")
    assert "beta_value" not in rna_only.columns
    dna_only = pd.read_pickle(tmp_path / "dna_only_unmatched.pkl")
    assert "tpm_unstranded" not in dna_only.columns
    # site labels consistent with the label encoder
    assert set(df["primary_site"]) <= set(le.classes_)
    enc = le.transform(df["primary_site"])
    np.testing.assert_array_equal(enc, df["primary_site_encoded"].values)


def test_dataset_getitem_and_from_numpy(rng):
    tpm = rng.normal(size=(10, 5)).astype(np.float32)
    beta = rng.uniform(size=(10, 7)).astype(np.float32)
    site = rng.integers(0, 3, size=10)
    ds = MultiModalDataset.from_numpy(tpm, beta, site)
    t, b, s = ds[3]
    np.testing.assert_array_equal(t, tpm[3])
    np.testing.assert_array_equal(b, beta[3])
    assert s == site[3]
    # pandas construction path
    ds2 = MultiModalDataset(make_dataframe(tpm, beta, site, 3))
    np.testing.assert_allclose(ds2.tpm_data, tpm)


def test_batch_indices_semantics():
    key = jax.random.PRNGKey(0)
    idx = batch_indices(key, 100, 32, shuffle=True, drop_last=True)
    assert idx.shape == (3, 32)  # drop_last: 100 // 32
    flat = np.asarray(idx).ravel()
    assert len(set(flat.tolist())) == 96  # no repeats
    idx2 = batch_indices(key, 100, 32, shuffle=False, drop_last=False)
    assert idx2.shape == (4, 32)  # padded final batch
    np.testing.assert_array_equal(np.asarray(idx2[0]), np.arange(32))


def test_fused_engine_accepts_sharded_inputs():
    """The SAME fused fit runs with mesh-sharded tables — GSPMD propagates
    the batch sharding through the whole scan (no code changes needed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_los_angeles_tpu.parallel.sharding import make_mesh
    from vae_los_angeles_tpu.training import engine

    cfg = Config(input_dim_a=16, input_dim_b=24, latent_dim=4, batch_size=16)
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=160, dim_a=16, dim_b=24, n_sites=4, seed=0
    )
    tr, va = train_val_indices(160)
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))
    train, val = arrays.take(tr), arrays.take(va)

    plain = engine.fit(
        "rna2dna", cfg, train, val, jax.random.PRNGKey(0), 4, num_epochs=3
    )

    mesh = make_mesh(8, model_parallel=1)
    shard = NamedSharding(mesh, P("data"))
    strain = MultiModalArrays(
        *(jax.device_put(x, shard) for x in train)
    )
    sval = MultiModalArrays(*(jax.device_put(x, shard) for x in val))
    sharded = engine.fit(
        "rna2dna", cfg, strain, sval, jax.random.PRNGKey(0), 4, num_epochs=3
    )
    np.testing.assert_allclose(
        np.asarray(plain.val_losses), np.asarray(sharded.val_losses), rtol=1e-4
    )


def test_batch_indices_wraps_tiny_n():
    """drop_last=False with n < batch_size must tile the permutation into
    one full batch (a single pad slice came up short and crashed the
    reshape)."""
    from vae_los_angeles_tpu.data.dataset import batch_indices

    idx = batch_indices(jax.random.PRNGKey(0), 3, 8, drop_last=False)
    assert idx.shape == (1, 8)
    assert set(np.asarray(idx).ravel()) == {0, 1, 2}  # only real samples


def test_ensure_synthetic_artifacts_no_clobber(tmp_path):
    """The shared --synthetic bootstrap: generates once, no-ops when the
    target exists, and never overwrites sibling artifacts when only a
    custom target basename is missing."""
    from vae_los_angeles_tpu.data.synthetic import ensure_synthetic_artifacts

    d = str(tmp_path / "data")
    assert ensure_synthetic_artifacts(d, dim_a=7, dim_b=9) is True
    for name in ("processed_data.pkl", "label_encoder.pkl",
                 "rna_only_unmatched.pkl", "dna_only_unmatched.pkl",
                 "feature_names.pkl"):
        assert os.path.exists(os.path.join(d, name)), name
    # idempotent: second call is a no-op
    mtime = os.path.getmtime(os.path.join(d, "processed_data.pkl"))
    assert ensure_synthetic_artifacts(d, dim_a=7, dim_b=9) is False
    assert os.path.getmtime(os.path.join(d, "processed_data.pkl")) == mtime
    # custom missing target: generated, but existing siblings are preserved
    le = os.path.join(d, "label_encoder.pkl")
    le_mtime = os.path.getmtime(le)
    custom = os.path.join(d, "custom.pkl")
    assert ensure_synthetic_artifacts(d, target_pkl=custom, dim_a=7, dim_b=9)
    assert os.path.exists(custom)
    assert os.path.getmtime(le) == le_mtime
    # no staging debris
    assert not [n for n in os.listdir(d) if n.startswith(".synthetic_")]
