"""Adafactor threading through the engine, populations, and the TP step.

The optimizer itself is parity-locked against the live
``transformers.optimization.Adafactor`` oracle in tests/test_optim.py;
these tests cover Config.optimizer="adafactor" reaching every training
surface. It exists for the wide regime: the AdamW step there is bound by
sweeping params+m+v through HBM, and factored second moments drop that to
~params only (docs/SCALING.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine

N_SITES = 5


def _arrays(n=96, dim_a=33, dim_b=41, seed=0):
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=dim_a, dim_b=dim_b, n_sites=N_SITES, seed=seed
    )
    return MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))


def _cfg(**kw):
    base = dict(
        input_dim_a=33, input_dim_b=41, latent_dim=6, embed_dim=8,
        batch_size=16, patience=10_000, optimizer="adafactor",
        learning_rate=1e-3,  # adafactor convention: higher external lr
    )
    base.update(kw)
    return Config(**base)


def test_adafactor_fit_trains_with_factored_state():
    arrays = _arrays()
    tr, va = arrays.take(jnp.arange(64)), arrays.take(jnp.arange(64, 96))
    res = engine.fit("rna2dna", _cfg(), tr, va, jax.random.PRNGKey(0),
                     N_SITES, num_epochs=8)
    assert np.all(np.isfinite(np.asarray(res.val_losses)))
    assert float(res.val_losses[-1]) < float(res.val_losses[0])
    opt = res.carry["opt"]
    assert set(opt) == {"step", "vr", "vc"}  # factored stats, no m/v
    # the wide decoder weight's stats are VECTORS, not a matrix
    w = res.params["decoder_dna"]["fc3"]["w"]
    assert opt["vr"]["decoder_dna"]["fc3"]["w"].shape == (w.shape[0],)
    assert opt["vc"]["decoder_dna"]["fc3"]["w"].shape == (w.shape[1],)


def test_adafactor_rejects_pallas_and_unknown_names():
    arrays = _arrays(n=48)
    tr, va = arrays.take(jnp.arange(32)), arrays.take(jnp.arange(32, 48))
    with pytest.raises(ValueError, match="XLA paths only"):
        engine.fit("rna2dna", _cfg(), tr, va, jax.random.PRNGKey(0), N_SITES,
                   num_epochs=1, fused_epoch=True)
    with pytest.raises(ValueError, match="unsupported optimizer"):
        engine.fit("rna2dna", _cfg(optimizer="sgd"), tr, va,
                   jax.random.PRNGKey(0), N_SITES, num_epochs=1)


def test_adafactor_resume_roundtrip(tmp_path):
    """The factored carry persists and restores bit-exactly, and a resumed
    fit continues from it (same optimizer config required, as with AdamW)."""
    from vae_los_angeles_tpu.training import checkpoint

    arrays = _arrays(n=48)
    tr, va = arrays.take(jnp.arange(32)), arrays.take(jnp.arange(32, 48))
    cfg = _cfg()
    res = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), N_SITES,
                     num_epochs=2)
    checkpoint.save_resume("rna2dna", "af", res.carry, 2,
                           checkpoint_dir=str(tmp_path), seed=0)
    carry2, n_done, _, _ = checkpoint.load_resume(
        "rna2dna", "af", checkpoint_dir=str(tmp_path)
    )
    assert n_done == 2
    for orig, back in zip(
        jax.tree.leaves(res.carry["opt"]), jax.tree.leaves(carry2["opt"])
    ):
        assert np.array_equal(np.asarray(orig), np.asarray(back))
    cont = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), N_SITES,
                      num_epochs=2, resume_carry=carry2, start_epoch=2)
    assert np.all(np.isfinite(np.asarray(cont.val_losses)))
    # resuming under the wrong optimizer errors clearly, not deep in tracing
    with pytest.raises(ValueError, match="resume checkpoint holds"):
        engine.fit("rna2dna", cfg.replace(optimizer="adamw"), tr, va,
                   jax.random.PRNGKey(0), N_SITES, num_epochs=2,
                   resume_carry=carry2, start_epoch=2)


def test_adafactor_population_fit_folds():
    from vae_los_angeles_tpu.parallel import vmap_meta

    arrays = _arrays(n=80)
    folds = [arrays.take(jnp.arange(i, i + 48)) for i in range(2)]
    vals = [arrays.take(jnp.arange(60, 80)) for _ in range(2)]
    fits = vmap_meta.fit_folds(
        "rna2dna", _cfg(), folds, vals, jax.random.PRNGKey(0), N_SITES,
        num_epochs=2,
    )
    assert len(fits) == 2
    for f in fits:
        assert np.all(np.isfinite(np.asarray(f.val_losses)))
        assert "vr" in f.carry["opt"]


def test_sharded_step_rejects_mismatched_optimizer_state():
    """A state built under one Config.optimizer fed to a step built for
    another errors clearly at trace time, not as a KeyError mid-trace."""
    from vae_los_angeles_tpu.parallel import sharding

    mesh = sharding.make_mesh(8, model_parallel=2)
    params, state, opt = sharding.make_sharded_train_state(
        "rna2dna", _cfg(), N_SITES, mesh, jax.random.PRNGKey(0)
    )  # adafactor state
    batch = sharding.shard_arrays(_arrays(n=32), mesh)
    step = sharding.sharded_train_step("rna2dna")  # adamw step
    sargs = (jnp.float32(1e-3), jnp.float32(1e-5), jnp.float32(1e-3),
             jnp.float32(1.0))
    with pytest.raises(ValueError, match="optimizer state slots"):
        step(params, state, opt, batch, jax.random.PRNGKey(0), *sargs)
    with pytest.raises(ValueError, match="unsupported optimizer"):
        sharding.sharded_train_step("rna2dna", optimizer="sgd")


def test_resume_notes_ignored_moments_dtype(tmp_path, capsys):
    """Resuming under a different MOMENTS_DTYPE keeps the checkpoint's
    storage and says so (the knob applies to fresh runs only)."""
    from vae_los_angeles_tpu.training import checkpoint

    arrays = _arrays(n=48)
    tr, va = arrays.take(jnp.arange(32)), arrays.take(jnp.arange(32, 48))
    cfg = _cfg(optimizer="adamw")  # fp32 moments
    res = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), N_SITES,
                     num_epochs=1)
    checkpoint.save_resume("rna2dna", "mdt", res.carry, 1,
                           checkpoint_dir=str(tmp_path), seed=0)
    carry2, _, _, _ = checkpoint.load_resume(
        "rna2dna", "mdt", checkpoint_dir=str(tmp_path)
    )
    engine.fit("rna2dna", cfg.replace(moments_dtype="bfloat16"), tr, va,
               jax.random.PRNGKey(0), N_SITES, num_epochs=1,
               resume_carry=carry2, start_epoch=1)
    out = capsys.readouterr().out
    assert "ignored for this run" in out


def test_checkpoint_rejects_reserved_bf16_marker(tmp_path):
    from vae_los_angeles_tpu.training import checkpoint

    with pytest.raises(ValueError, match="reserved bfloat16 storage marker"):
        checkpoint.save(str(tmp_path / "x.npz"),
                        {"w.__bf16__": jnp.ones((2,))})


def test_adafactor_sharded_tp_step():
    """The DP×TP step runs Adafactor with mesh-committed factored stats and
    stays stable across repeated calls (output shardings must match inputs)."""
    from vae_los_angeles_tpu.parallel import sharding

    cfg = _cfg()
    mesh = sharding.make_mesh(8, model_parallel=2)
    arrays = _arrays(n=32)
    key = jax.random.PRNGKey(0)
    params, state, opt = sharding.make_sharded_train_state(
        "rna2dna", cfg, N_SITES, mesh, key
    )
    assert set(opt) == {"step", "vr", "vc"}
    batch = sharding.shard_arrays(arrays, mesh)
    step = sharding.sharded_train_step("rna2dna", optimizer="adafactor")
    sargs = (jnp.float32(1e-3), jnp.float32(1e-5), jnp.float32(1e-3),
             jnp.float32(1.0))
    for _ in range(2):  # second call exercises sharding-stability
        params, state, opt, loss = step(params, state, opt, batch, key, *sargs)
    assert np.isfinite(float(loss))
