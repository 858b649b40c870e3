"""Mixed-precision (bfloat16 matmul) policy tests.

The policy (``Config.compute_dtype = "bfloat16"``) casts 2-D matmul operands
(Linear weights, Embedding tables) to bf16 INSIDE the differentiated loss —
``ops.nn.cast_matmul_params`` — while ``linear_apply`` requests fp32 MXU
accumulation and the fp32 bias promotes activations back to fp32, so
BatchNorm statistics, losses, master params and the AdamW sweep all stay
full precision. Default fp32 must be bit-identical to the pre-policy code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.ops import nn
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
        batch_size=16, patience=10_000,
    )
    base.update(kw)
    return Config(**base)


def test_cast_matmul_params_casts_only_2d_leaves():
    key = jax.random.PRNGKey(0)
    params = {
        "fc": nn.linear_init(key, 12, 7),
        "bn": {"gamma": jnp.ones((7,)), "beta": jnp.zeros((7,))},
        "emb": nn.embedding_init(key, 4, 3),
    }
    cast = nn.cast_matmul_params(params, jnp.bfloat16)
    assert cast["fc"]["w"].dtype == jnp.bfloat16
    assert cast["emb"]["table"].dtype == jnp.bfloat16
    assert cast["fc"]["b"].dtype == jnp.float32  # bias stays fp32
    assert cast["bn"]["gamma"].dtype == jnp.float32
    # fp32 is the identity (same objects, no tree rebuild cost in the graph)
    same = nn.cast_matmul_params(params, jnp.float32)
    assert same is params


def test_linear_apply_follows_weight_dtype_fp32_out():
    key = jax.random.PRNGKey(1)
    params = nn.linear_init(key, 24, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 24))
    y32 = nn.linear_apply(params, x)
    ybf = nn.linear_apply(nn.cast_matmul_params(params, jnp.bfloat16), x)
    assert y32.dtype == jnp.float32
    assert ybf.dtype == jnp.float32  # fp32 accumulation + fp32 bias
    # bf16 mantissa is 8 bits: the rounded matmul must track fp32 closely
    assert float(jnp.max(jnp.abs(ybf - y32))) < 0.1
    assert float(jnp.max(jnp.abs(ybf - y32))) > 0.0  # really ran reduced


def test_bf16_fit_trains_and_tracks_fp32_quality():
    """A short bf16 run must train (finite, decreasing loss), keep fp32
    master params/optimizer state, and land near the fp32 run's val loss."""
    arrays = _arrays()
    tr, va = arrays.take(jnp.arange(64)), arrays.take(jnp.arange(64, 96))
    key = jax.random.PRNGKey(0)

    res32 = engine.fit("rna2dna", _cfg(), tr, va, key, N_SITES, num_epochs=8)
    resbf = engine.fit(
        "rna2dna", _cfg(compute_dtype="bfloat16"), tr, va, key, N_SITES,
        num_epochs=8,
    )
    for res in (res32, resbf):
        assert np.all(np.isfinite(np.asarray(res.val_losses)))
        assert float(res.val_losses[-1]) < float(res.val_losses[0])
    # master params and Adam moments stay fp32 under the bf16 policy
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(resbf.params)
    )
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(resbf.carry["opt"])
        if jnp.issubdtype(leaf.dtype, jnp.floating)  # skip the int step count
    )
    assert not any(
        leaf.dtype == jnp.bfloat16
        for leaf in jax.tree.leaves(resbf.carry["opt"])
    )
    # same trajectory basin: bf16 rounding perturbs, it must not derail
    v32, vbf = float(res32.val_losses[-1]), float(resbf.val_losses[-1])
    assert abs(vbf - v32) / v32 < 0.05, (v32, vbf)
    # and it genuinely ran a different program (not silently fp32)
    assert vbf != v32


def test_bf16_predict_matches_fp32_within_rounding():
    arrays = _arrays(n=32)
    cfg = _cfg()
    key = jax.random.PRNGKey(3)
    from vae_los_angeles_tpu.training.tasks import TASKS

    params, state = TASKS["dna2rna"].init(key, cfg, N_SITES)
    p32 = engine.predict("dna2rna", params, state, arrays)
    pbf = engine.predict(
        "dna2rna", params, state, arrays, compute_dtype="bfloat16"
    )
    assert pbf.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(pbf - p32)))
    assert 0.0 < err < 0.15  # differs (really bf16) but tracks fp32


def test_bf16_rejects_pallas_paths_and_bad_names():
    arrays = _arrays(n=48)
    tr, va = arrays.take(jnp.arange(32)), arrays.take(jnp.arange(32, 48))
    cfg = _cfg(compute_dtype="bfloat16")
    with pytest.raises(ValueError, match="XLA paths only"):
        engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), N_SITES,
                   num_epochs=1, fused_epoch=True)
    with pytest.raises(ValueError, match="unsupported compute_dtype"):
        engine.fit("rna2dna", cfg.replace(compute_dtype="float16"), tr, va,
                   jax.random.PRNGKey(0), N_SITES, num_epochs=1)


def test_bf16_population_fit_folds():
    """The vmapped meta-loops honor cfg.compute_dtype (distinct cache key)."""
    from vae_los_angeles_tpu.parallel import vmap_meta

    arrays = _arrays(n=80)
    folds = [arrays.take(jnp.arange(i, i + 48)) for i in range(2)]
    vals = [arrays.take(jnp.arange(60, 80)) for _ in range(2)]
    fits = vmap_meta.fit_folds(
        "rna2dna", _cfg(compute_dtype="bfloat16"), folds, vals,
        jax.random.PRNGKey(0), N_SITES, num_epochs=2,
    )
    assert len(fits) == 2
    for f in fits:
        assert np.all(np.isfinite(np.asarray(f.val_losses)))


def test_env_override_compute_dtype(monkeypatch):
    monkeypatch.setenv("COMPUTE_DTYPE", "bfloat16")
    assert Config.from_env().compute_dtype == "bfloat16"


def _save_rna2dna_checkpoint(cfg, tmp_path, monkeypatch):
    from vae_los_angeles_tpu.training import checkpoint
    from vae_los_angeles_tpu.training.tasks import TASKS

    params, state = TASKS["rna2dna"].init(jax.random.PRNGKey(7), cfg, N_SITES)
    monkeypatch.chdir(tmp_path)
    checkpoint.save_best("rna2dna", "mp-test", params, state, "checkpoints")
    checkpoint.write_run_id("rna2dna", "mp-test")


def test_bf16_loaded_model_serves_cast_weights(tmp_path, monkeypatch):
    """Config.compute_dtype reaches the evaluation loaders: weights are cast
    ONCE at load time (2-D leaves bf16, biases/BN fp32) and the served
    forward tracks the fp32 model within bf16 rounding."""
    from vae_los_angeles_tpu.evaluation import loading

    cfg = _cfg()
    _save_rna2dna_checkpoint(cfg, tmp_path, monkeypatch)

    m32 = loading.load_rna2dna(cfg=cfg)
    mbf = loading.load_rna2dna(cfg=cfg.replace(compute_dtype="bfloat16"))
    leaves = jax.tree.leaves(mbf.params)
    assert any(leaf.dtype == jnp.bfloat16 for leaf in leaves)  # cast at load
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(mbf.state)
    )  # BatchNorm state stays fp32

    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(9), (8, 33)), np.float32
    )
    site = np.arange(8) % N_SITES
    key = jax.random.PRNGKey(4)
    _, mu32, _ = m32(rna=x, site=site, key=key)
    _, mubf, _ = mbf(rna=x, site=site, key=key)
    err = float(np.max(np.abs(mubf - mu32)))
    assert 0.0 < err < 0.15  # really bf16, still tracks fp32


def test_bf16_sharded_tp_step():
    """The DP×TP sharded step honors compute_dtype: bf16 runs, produces a
    finite loss that differs from fp32, and masters/optimizer stay fp32."""
    from vae_los_angeles_tpu.parallel import sharding

    cfg = _cfg()
    mesh = sharding.make_mesh(8, model_parallel=2)
    arrays = _arrays(n=32)
    key = jax.random.PRNGKey(0)

    losses = {}
    for dtype in ("float32", "bfloat16"):
        params, state, opt = sharding.make_sharded_train_state(
            "rna2dna", cfg, N_SITES, mesh, key
        )
        batch = sharding.shard_arrays(arrays, mesh)
        step = sharding.sharded_train_step("rna2dna", compute_dtype=dtype)
        sargs = (jnp.float32(5e-4), jnp.float32(1e-5), jnp.float32(1e-3),
                 jnp.float32(1.0))
        params, state, opt, loss = step(params, state, opt, batch, key, *sargs)
        losses[dtype] = float(loss)
        assert np.isfinite(losses[dtype])
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(params)
        )
    # close (same model) but not identical (really ran reduced precision)
    f32, bf16 = losses["float32"], losses["bfloat16"]
    assert f32 != bf16
    assert abs(bf16 - f32) / abs(f32) < 0.02, losses


def test_cv_scores_with_training_dtype(tmp_path, monkeypatch):
    """COMPUTE_DTYPE=bfloat16 must reach the CV harness's outer-fold scoring
    (engine.predict), not just fold training — the reported metrics must
    describe the configuration as served."""
    from vae_los_angeles_tpu.data.synthetic import write_synthetic_artifacts
    from vae_los_angeles_tpu.evaluation import cross_modality_cv as cv
    from vae_los_angeles_tpu.training import engine as eng

    monkeypatch.chdir(tmp_path)
    write_synthetic_artifacts(
        "data", n_samples=160, dim_a=17, dim_b=19, n_sites=4
    )
    monkeypatch.setenv("COMPUTE_DTYPE", "bfloat16")

    seen = []
    real_predict = eng.predict

    def spy(*args, **kwargs):
        seen.append(kwargs.get("compute_dtype", "float32"))
        return real_predict(*args, **kwargs)

    monkeypatch.setattr(eng, "predict", spy)
    cv.main([
        "--folds", "2", "--epochs", "1", "--neighbors", "1",
        "--data_path", "data/processed_data.pkl",
    ])
    assert seen and all(d == "bfloat16" for d in seen)


def test_debug_nans_allows_healthy_early_stop():
    """An early-stopped HEALTHY run must complete under jax_debug_nans: the
    post-stop loss rows fill with +inf in debug mode (NaN otherwise), so the
    sanitizer doesn't crash a converged run."""
    arrays = _arrays()
    tr, va = arrays.take(jnp.arange(64)), arrays.take(jnp.arange(64, 96))
    cfg = _cfg(patience=2)
    jax.config.update("jax_debug_nans", True)
    try:
        res = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0),
                         N_SITES, num_epochs=60)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert bool(res.stopped), "pick sizes/seed so early stop really fires"
    n_ran = int(res.epochs_ran)
    assert n_ran < 60
    tail = np.asarray(res.val_losses)[n_ran:]
    assert np.all(np.isposinf(tail))  # debug fill is +inf, not NaN
    # and epochs_ran/consumer slicing is unaffected by the fill value
    assert np.all(np.isfinite(np.asarray(res.val_losses)[:n_ran]))


def test_bf16_moments_train_and_quality():
    """MOMENTS_DTYPE=bfloat16: AdamW m/v stored reduced (fp32 math, fp32
    master params) — trains to a val loss near the fp32-moments run."""
    arrays = _arrays()
    tr, va = arrays.take(jnp.arange(64)), arrays.take(jnp.arange(64, 96))
    key = jax.random.PRNGKey(0)

    res32 = engine.fit("rna2dna", _cfg(), tr, va, key, N_SITES, num_epochs=8)
    resbf = engine.fit(
        "rna2dna", _cfg(moments_dtype="bfloat16"), tr, va, key, N_SITES,
        num_epochs=8,
    )
    for sub in ("m", "v"):
        assert all(
            leaf.dtype == jnp.bfloat16
            for leaf in jax.tree.leaves(resbf.carry["opt"][sub])
        )
    # master params stay fp32 and the run lands in the fp32 quality basin
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(resbf.params)
    )
    v32, vbf = float(res32.val_losses[-1]), float(resbf.val_losses[-1])
    assert np.isfinite(vbf) and vbf != v32
    assert abs(vbf - v32) / v32 < 0.05, (v32, vbf)


def test_bf16_moments_rejected_by_pallas_and_resume_roundtrip(tmp_path):
    """Reduced moments are an XLA-path knob (fp32 Pallas programs reject
    them), and a bf16-moments carry round-trips through the resume
    checkpoint bit-exactly."""
    from vae_los_angeles_tpu.training import checkpoint

    arrays = _arrays(n=48)
    tr, va = arrays.take(jnp.arange(32)), arrays.take(jnp.arange(32, 48))
    cfg = _cfg(moments_dtype="bfloat16")
    with pytest.raises(ValueError, match="XLA paths only"):
        engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), N_SITES,
                   num_epochs=1, fused_epoch=True)

    res = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), N_SITES,
                     num_epochs=2)
    checkpoint.save_resume("rna2dna", "bf16m", res.carry, 2,
                           checkpoint_dir=str(tmp_path), seed=0)
    carry2, n_done, _, _ = checkpoint.load_resume(
        "rna2dna", "bf16m", checkpoint_dir=str(tmp_path)
    )
    assert n_done == 2
    for orig, back in zip(
        jax.tree.leaves(res.carry["opt"]), jax.tree.leaves(carry2["opt"])
    ):
        assert orig.dtype == np.asarray(back).dtype
        assert np.array_equal(np.asarray(orig), np.asarray(back))


def test_bf16_predict_composes_with_chunking_and_mesh():
    """compute_dtype rides through the chunked/sharded serving paths: the
    chunked + population-mesh prediction equals the whole-table bf16 one."""
    from vae_los_angeles_tpu.parallel.vmap_meta import population_mesh
    from vae_los_angeles_tpu.training.tasks import TASKS

    arrays = _arrays(n=50)  # uneven: 50 rows over chunk 16 and an 8-way mesh
    cfg = _cfg()
    # the deterministic AE (no sampling) so chunked == whole exactly, like
    # the fp32 chunk tests in test_engine.py
    params, state = TASKS["rna2dna_ae"].init(jax.random.PRNGKey(5), cfg, N_SITES)
    whole = engine.predict("rna2dna_ae", params, state, arrays,
                           compute_dtype="bfloat16")
    chunked = engine.predict(
        "rna2dna_ae", params, state, arrays,
        mesh=population_mesh(), chunk_size=16, compute_dtype="bfloat16",
    )
    assert chunked.shape == whole.shape
    assert np.allclose(np.asarray(chunked), np.asarray(whole), atol=1e-6)
    # and it really served reduced precision: fp32 whole-table differs
    whole32 = engine.predict("rna2dna_ae", params, state, arrays)
    assert float(np.max(np.abs(np.asarray(whole32) - np.asarray(whole)))) > 0


def test_bf16_loader_downgrades_pallas(tmp_path, monkeypatch, capsys):
    """use_pallas + bf16 serves through the XLA path (fp32 Pallas programs),
    announcing the downgrade like the training CLI does."""
    from vae_los_angeles_tpu.evaluation import loading

    cfg = _cfg(use_pallas=True, compute_dtype="bfloat16")
    _save_rna2dna_checkpoint(cfg, tmp_path, monkeypatch)
    model = loading.load_rna2dna(cfg=cfg)
    assert model._fused is None
    assert "XLA path" in capsys.readouterr().out
