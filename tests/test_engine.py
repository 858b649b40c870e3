"""End-to-end smoke tests of the fused training engine on synthetic data
(SURVEY §4 implication (c): smoke training on the real schema)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.ops.metrics import compute_imputation_metrics
from vae_los_angeles_tpu.training import engine

DIM_A, DIM_B, N_SITES = 33, 45, 5


@pytest.fixture(scope="module")
def small_data():
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=256, dim_a=DIM_A, dim_b=DIM_B, n_sites=N_SITES, seed=3
    )
    tr, va = train_val_indices(len(site))
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))
    return arrays.take(tr), arrays.take(va)


@pytest.fixture(scope="module")
def cfg():
    return Config(
        input_dim_a=DIM_A,
        input_dim_b=DIM_B,
        latent_dim=8,
        batch_size=32,
        num_epochs=30,
    )


def test_fit_rna2dna_learns(small_data, cfg):
    train, val = small_data
    res = engine.fit(
        "rna2dna", cfg, train, val, jax.random.PRNGKey(0), N_SITES, num_epochs=30
    )
    train_losses = np.asarray(res.train_losses)
    val_losses = np.asarray(res.val_losses)
    ran = ~np.isnan(val_losses)
    assert ran[0]
    # loss decreases over training
    assert val_losses[ran][-1] < val_losses[0]
    assert float(res.best_val_loss) <= np.nanmin(val_losses) + 1e-4
    # β-warmup schedule: epoch0 → 0, grows toward beta_start
    betas = np.asarray(res.betas)
    assert betas[0] == 0.0
    assert betas[ran][-1] <= cfg.beta_start + 1e-9

    # prediction beats the mean baseline (reference's oracle strategy)
    pred = np.asarray(
        engine.predict("rna2dna", res.params, res.state, val)
    )
    mean_pred = np.tile(
        np.asarray(train.beta).mean(axis=0), (len(val), 1)
    )
    m_vae = compute_imputation_metrics(np.asarray(val.beta), pred)
    m_mean = compute_imputation_metrics(np.asarray(val.beta), mean_pred)
    assert m_vae["MSE"] < m_mean["MSE"]
    assert m_vae["PearsonMean"] > m_mean["PearsonMean"]


@pytest.mark.parametrize("task", ["dna2rna", "rna2dna_ae", "dna2rna_ae"])
def test_fit_other_tasks_smoke(small_data, cfg, task):
    train, val = small_data
    res = engine.fit(
        task, cfg, train, val, jax.random.PRNGKey(1), N_SITES, num_epochs=8
    )
    val_losses = np.asarray(res.val_losses)
    assert np.isfinite(val_losses[0])
    assert val_losses[7] < val_losses[0]


def test_fit_multimodal_with_class_weights(small_data, cfg):
    train, val = small_data
    cw = np.ones(N_SITES, np.float32)
    res = engine.fit(
        "multimodal",
        cfg,
        train,
        val,
        jax.random.PRNGKey(2),
        N_SITES,
        num_epochs=8,
        class_weights=cw,
    )
    assert np.isfinite(np.asarray(res.val_losses)[:8]).all()


def test_early_stopping_freezes_best(small_data, cfg):
    """With tiny patience the run stops early and best snapshot is kept."""
    train, val = small_data
    cfg2 = cfg.replace(patience=2, num_epochs=40)
    res = engine.fit(
        "rna2dna", cfg2, train, val, jax.random.PRNGKey(3), N_SITES, num_epochs=40
    )
    val_losses = np.asarray(res.val_losses)
    if bool(res.stopped):
        # NaN tail after the stop epoch
        ran = ~np.isnan(val_losses)
        stop_at = int(ran.sum())
        assert stop_at < 40
        assert np.isnan(val_losses[stop_at:]).all()
        best = float(res.best_val_loss)
        np.testing.assert_allclose(best, np.nanmin(val_losses), rtol=1e-6)


def test_drop_last_false_uses_remainder(small_data, cfg):
    """CV inner loops keep the partial batch (vae_cross_modality_cv.py:121)."""
    train, val = small_data
    res = engine.fit(
        "rna2dna",
        cfg,
        train,
        val,
        jax.random.PRNGKey(4),
        N_SITES,
        num_epochs=3,
        drop_last=False,
    )
    assert np.isfinite(np.asarray(res.val_losses)[:3]).all()


def test_fit_deterministic(small_data, cfg):
    train, val = small_data
    r1 = engine.fit("rna2dna", cfg, train, val, jax.random.PRNGKey(7), N_SITES, num_epochs=5)
    r2 = engine.fit("rna2dna", cfg, train, val, jax.random.PRNGKey(7), N_SITES, num_epochs=5)
    np.testing.assert_allclose(
        np.asarray(r1.val_losses)[:5], np.asarray(r2.val_losses)[:5], rtol=1e-6
    )


def test_fit_multimodal_fused_epoch_path(small_data, cfg):
    """Engine routes the tri-modal task through the whole-epoch megakernel
    (interpret mode off-TPU) and still trains."""
    train, val = small_data
    cw = np.ones(N_SITES, np.float32)
    res = engine.fit(
        "multimodal",
        cfg,
        train,
        val,
        jax.random.PRNGKey(2),
        N_SITES,
        num_epochs=3,
        class_weights=cw,
        fused_epoch=True,
    )
    val_losses = np.asarray(res.val_losses)
    assert np.isfinite(val_losses[:3]).all()
    assert val_losses[2] < val_losses[0]


def test_fit_rejects_empty_batch_schedule(small_data, cfg):
    """n_train < batch_size with drop_last would train nothing (the
    reference divides by len(loader)=0); the engine fails loudly."""
    train, val = small_data
    tiny = train.take(jnp.arange(8))
    with pytest.raises(ValueError, match="no training batches"):
        engine.fit(
            "rna2dna", cfg, tiny, val, jax.random.PRNGKey(0), N_SITES,
            num_epochs=2,
        )
    # drop_last=False with the same data still trains on the remainder batch
    res = engine.fit(
        "rna2dna", cfg, tiny, val, jax.random.PRNGKey(0), N_SITES,
        num_epochs=2, drop_last=False,
    )
    assert np.isfinite(np.asarray(res.train_losses)).all()


def test_fit_rejects_empty_validation_set(small_data, cfg):
    train, _ = small_data
    empty = train.take(jnp.arange(0))
    with pytest.raises(ValueError, match="empty validation set"):
        engine.fit(
            "rna2dna", cfg, train, empty, jax.random.PRNGKey(0), N_SITES,
            num_epochs=2,
        )


def test_epochs_ran_field(small_data, cfg):
    """FitResult.epochs_ran reflects the engine's own executed-epoch count."""
    train, val = small_data
    cfg2 = cfg.replace(patience=2)
    res = engine.fit(
        "rna2dna", cfg2, train, val, jax.random.PRNGKey(3), N_SITES, num_epochs=40
    )
    val_losses = np.asarray(res.val_losses)
    n_ran = int(res.epochs_ran)
    # healthy (non-diverging) run: matches the non-NaN prefix exactly
    assert n_ran == int((~np.isnan(val_losses)).sum())
    assert 0 < n_ran <= 40


def test_beta_warmup_zero_means_no_warmup(small_data, cfg):
    """beta_warmup_epochs=0 gives full-strength β from epoch 0 (0/0 would
    otherwise NaN-poison the entire run)."""
    train, val = small_data
    cfg2 = cfg.replace(beta_warmup_epochs=0)
    res = engine.fit(
        "rna2dna", cfg2, train, val, jax.random.PRNGKey(5), N_SITES, num_epochs=3
    )
    np.testing.assert_allclose(np.asarray(res.betas)[:3], cfg.beta_start)
    assert np.isfinite(np.asarray(res.val_losses)[:3]).all()


def test_chunked_predict_matches_unchunked(small_data, cfg):
    """Streaming cohort serving: chunk_size slices through ONE compiled
    program must reproduce the whole-table prediction. The AE predict is
    fully deterministic (eval mode, no sampling), so equality is exact —
    including the clipped-index padding of the uneven final chunk. Host
    numpy leaves stay host-side until their chunk is served."""
    from vae_los_angeles_tpu.training.tasks import TASKS

    train, _ = small_data
    cohort = train.take(np.arange(37))  # 37 rows, chunk 13 → 13+13+11
    params, state = TASKS["rna2dna_ae"].init(jax.random.PRNGKey(2), cfg, N_SITES)

    whole = engine.predict("rna2dna_ae", params, state, cohort)
    chunked = engine.predict(
        "rna2dna_ae", params, state, cohort, chunk_size=13
    )
    assert isinstance(chunked, np.ndarray)
    # different program shapes (13- vs 37-row) may fuse differently → one-ulp
    np.testing.assert_allclose(np.asarray(whole), chunked, atol=1e-6)

    # host-resident numpy cohort (the HBM-exceeding layout) serves identically
    host_cohort = MultiModalArrays(
        np.asarray(cohort.tpm), np.asarray(cohort.beta), np.asarray(cohort.site)
    )
    np.testing.assert_array_equal(
        engine.predict("rna2dna_ae", params, state, host_cohort, chunk_size=13),
        chunked,
    )

    # uniform contract: a cohort that FITS one chunk still returns host
    # numpy (and, deterministic here, the same values)
    one_chunk = engine.predict(
        "rna2dna_ae", params, state, cohort, chunk_size=64
    )
    assert isinstance(one_chunk, np.ndarray)
    np.testing.assert_allclose(one_chunk, np.asarray(whole), atol=1e-6)
    import pytest

    with pytest.raises(ValueError, match="chunk_size"):
        engine.predict("rna2dna_ae", params, state, cohort, chunk_size=0)

    # VAE path: sampling keys fold per chunk — row i of the chunked result
    # must equal a direct call on that chunk with the same folded key
    vp, vs = TASKS["rna2dna"].init(jax.random.PRNGKey(3), cfg, N_SITES)
    key = jax.random.PRNGKey(9)
    v_chunked = engine.predict("rna2dna", vp, vs, cohort, key=key, chunk_size=13)
    direct_last = engine.predict(
        "rna2dna", vp, vs, cohort.take(np.minimum(np.arange(26, 39), 36)),
        key=jax.random.fold_in(key, 2),
    )
    np.testing.assert_array_equal(v_chunked[26:], np.asarray(direct_last)[:11])
