"""Equivalence test for the whole-epoch megakernel: one kernel running
n_batches AdamW steps must match a scan of per-step fused train steps +
`optim.adamw_update` with identical injected noise."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.models.directional_vae import rna2dna_vae_init
from vae_los_angeles_tpu.ops import optim
from vae_los_angeles_tpu.ops.pallas.fused_epoch import rna2dna_fused_epoch
from vae_los_angeles_tpu.ops.pallas.fused_train import rna2dna_fused_train_step

DIM_A, DIM_B, N_SITES, LATENT = 40, 56, 5, 8
BATCH, N_BATCHES = 8, 4
LR, WD, BETA = 5e-4, 1e-5, 1e-3

# The rna2dna test runs 20 batches so the grid-streamed loss trace crosses
# multiple (8,128) output-block boundaries (blocks 0,1,2 incl. a partial
# tail) — the flush/revisit logic would be invisible at N_BATCHES<=8.
N_BATCHES_R2D = 20


def test_epoch_kernel_matches_step_scan(rng):
    params, state = rna2dna_vae_init(
        jax.random.PRNGKey(0), DIM_A, DIM_B, N_SITES, LATENT
    )
    n = BATCH * N_BATCHES_R2D
    x = jnp.asarray(rng.normal(size=(n, DIM_A)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.02, 0.98, size=(n, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(n,)))
    eps = jnp.asarray(rng.normal(size=(n, LATENT)).astype(np.float32))
    drop = jnp.asarray((rng.uniform(size=(n, 128)) < 0.9).astype(np.float32))

    # ---- reference: per-step fused kernel + adamw_update, step by step ----
    p_ref = params
    s_ref = state
    opt = optim.adamw_init(params)
    losses_ref = []
    for b in range(N_BATCHES_R2D):
        sl = slice(b * BATCH, (b + 1) * BATCH)
        loss, grads, bn_new = rna2dna_fused_train_step(
            p_ref, s_ref, x[sl], t[sl], site[sl], N_SITES,
            beta=BETA, eps=eps[sl], drop_mask=drop[sl],
        )
        losses_ref.append(float(loss))
        p_ref, opt = optim.adamw_update(p_ref, grads, opt, LR, WD)
        s_ref = {"encoder_rna": bn_new["encoder_rna"]}

    # ---- megakernel: whole epoch in one pallas_call ----
    zeros = jax.tree.map(jnp.zeros_like, params)
    losses, new_p, new_m, new_v, new_bn = rna2dna_fused_epoch(
        params, zeros, jax.tree.map(jnp.zeros_like, params), state,
        x, t, site, N_SITES,
        beta=BETA, lr=LR, weight_decay=WD, step0=0, n_batches=N_BATCHES_R2D,
        eps_ep=eps, drop_ep=drop,
    )

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_ref), rtol=1e-5
    )
    # final params after 4 in-kernel AdamW steps match the step-by-step path.
    # Exception: encoder fc bias — its TRUE gradient through train-mode
    # BatchNorm is analytically zero (BN re-centers the batch), so any
    # computed gradient is pure fp32 cancellation noise which Adam's
    # normalization amplifies into implementation-dependent drift. The
    # parameter has zero effect on the forward (losses match exactly), so a
    # loose tolerance is the correct check there.
    for path, leaf_ref in jax.tree.leaves_with_path(p_ref):
        key = jax.tree_util.keystr(path)
        leaf = dict(jax.tree.leaves_with_path(new_p))[path]
        atol = 5e-3 if key == "['encoder_rna']['fc']['b']" else 2e-5
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(leaf_ref), atol=atol,
            err_msg=f"params mismatch at {key}",
        )
    # AdamW moments match too (same BN-degeneracy exception)
    for path, leaf_ref in jax.tree.leaves_with_path(opt["m"]):
        key = jax.tree_util.keystr(path)
        leaf = dict(jax.tree.leaves_with_path(new_m))[path]
        atol = 5e-3 if key == "['encoder_rna']['fc']['b']" else 2e-5
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(leaf_ref), atol=atol,
            err_msg=f"m mismatch at {key}",
        )
    # BN running stats carried across all steps. The running MEAN absorbs
    # the degenerate fc-bias drift (batch mean of a1 = x·w1 + b1 moves 1:1
    # with b1, which the BN recentering makes forward-invariant — see the
    # bias exception above), so over 20 steps it inherits that drift; the
    # running VAR is bias-invariant and stays tight.
    np.testing.assert_allclose(
        np.asarray(new_bn["encoder_rna"]["bn"]["mean"]),
        np.asarray(s_ref["encoder_rna"]["bn"]["mean"]),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_bn["encoder_rna"]["bn"]["var"]),
        np.asarray(s_ref["encoder_rna"]["bn"]["var"]),
        atol=2e-4,
    )


def test_d2r_epoch_kernel_matches_step_scan(rng):
    from vae_los_angeles_tpu.models.directional_vae import dna2rna_vae_init
    from vae_los_angeles_tpu.ops.pallas.fused_epoch import dna2rna_fused_epoch
    from vae_los_angeles_tpu.ops.pallas.fused_train import dna2rna_fused_train_step

    params, state = dna2rna_vae_init(
        jax.random.PRNGKey(9), DIM_A, DIM_B, N_SITES, LATENT
    )
    n = BATCH * N_BATCHES
    dna = jnp.asarray(rng.uniform(0.02, 0.98, size=(n, DIM_B)).astype(np.float32))
    rna = jnp.asarray(rng.normal(size=(n, DIM_A)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(n,)))
    eps = jnp.asarray(rng.normal(size=(n, LATENT)).astype(np.float32))
    drop1 = jnp.asarray((rng.uniform(size=(n, 512)) < 0.9).astype(np.float32))
    drop2 = jnp.asarray((rng.uniform(size=(n, 256)) < 0.9).astype(np.float32))

    p_ref, s_ref = params, state
    opt = optim.adamw_init(params)
    losses_ref = []
    for b in range(N_BATCHES):
        sl = slice(b * BATCH, (b + 1) * BATCH)
        loss, grads, bn_new = dna2rna_fused_train_step(
            p_ref, s_ref, rna[sl], dna[sl], site[sl], N_SITES,
            beta=BETA, eps=eps[sl], drop_mask1=drop1[sl], drop_mask2=drop2[sl],
        )
        losses_ref.append(float(loss))
        p_ref, opt = optim.adamw_update(p_ref, grads, opt, LR, WD)
        s_ref = {"encoder_dna": bn_new["encoder_dna"]}

    losses, new_p, new_m, new_v, new_bn = dna2rna_fused_epoch(
        params, jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, params), state,
        dna, rna, site, N_SITES,
        beta=BETA, lr=LR, weight_decay=WD, step0=0, n_batches=N_BATCHES,
        eps_ep=eps, drop1_ep=drop1, drop2_ep=drop2,
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref), rtol=1e-5)
    # same BN-degeneracy exceptions as the rna2dna test: the biases feeding
    # train-mode BatchNorm have analytically-zero gradients
    degenerate = {"['encoder_dna']['fc1']['b']", "['encoder_dna']['fc2']['b']"}
    for path, leaf_ref in jax.tree.leaves_with_path(p_ref):
        key = jax.tree_util.keystr(path)
        leaf = dict(jax.tree.leaves_with_path(new_p))[path]
        atol = 5e-3 if key in degenerate else 5e-5
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(leaf_ref), atol=atol,
            err_msg=f"params mismatch at {key}",
        )
    np.testing.assert_allclose(
        np.asarray(new_bn["encoder_dna"]["bn2"]["var"]),
        np.asarray(s_ref["encoder_dna"]["bn2"]["var"]),
        atol=2e-4,
    )


def test_multimodal_epoch_kernel_matches_step_scan(rng):
    from vae_los_angeles_tpu.models.vae import multimodal_vae_init
    from vae_los_angeles_tpu.ops.pallas.fused_epoch_multimodal import (
        multimodal_fused_epoch,
    )
    from vae_los_angeles_tpu.ops.pallas.fused_train_multimodal import (
        multimodal_fused_train_step,
    )

    EMBED = 16
    GAMMA = 1.7
    params, state = multimodal_vae_init(
        jax.random.PRNGKey(4), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    n = BATCH * N_BATCHES
    a = jnp.asarray(rng.normal(size=(n, DIM_A)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.02, 0.98, size=(n, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(n,)))
    eps = jnp.asarray(rng.normal(size=(n, LATENT)).astype(np.float32))
    dropa = jnp.asarray((rng.uniform(size=(n, 128)) < 0.9).astype(np.float32))
    dropb1 = jnp.asarray((rng.uniform(size=(n, 512)) < 0.9).astype(np.float32))
    dropb2 = jnp.asarray((rng.uniform(size=(n, 256)) < 0.9).astype(np.float32))
    cw = jnp.asarray(rng.uniform(0.5, 2.0, size=N_SITES).astype(np.float32))

    # ---- reference: per-step fused kernel + adamw_update, step by step ----
    p_ref, s_ref = params, state
    opt = optim.adamw_init(params)
    losses_ref = []
    for k in range(N_BATCHES):
        sl = slice(k * BATCH, (k + 1) * BATCH)
        loss, grads, s_ref = multimodal_fused_train_step(
            p_ref, s_ref, a[sl], b[sl], site[sl], N_SITES,
            beta=BETA, gamma=GAMMA, class_weights=cw,
            eps=eps[sl], drop_a=dropa[sl], drop_b1=dropb1[sl],
            drop_b2=dropb2[sl],
        )
        losses_ref.append(float(loss))
        p_ref, opt = optim.adamw_update(p_ref, grads, opt, LR, WD)

    # ---- megakernel: whole epoch in one pallas_call ----
    losses, new_p, new_m, new_v, new_bn = multimodal_fused_epoch(
        params, jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, params), state,
        a, b, site, N_SITES,
        beta=BETA, gamma=GAMMA, class_weights=cw, lr=LR, weight_decay=WD,
        step0=0, n_batches=N_BATCHES,
        eps_ep=eps, dropa_ep=dropa, dropb1_ep=dropb1, dropb2_ep=dropb2,
    )

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_ref), rtol=1e-5
    )
    # biases feeding train-mode BatchNorm have analytically-zero gradients
    # (see the rna2dna test above) — loose tolerance there
    degenerate = {
        "['encoder_a']['fc']['b']",
        "['encoder_b']['fc1']['b']",
        "['encoder_b']['fc2']['b']",
    }
    flat_new = dict(jax.tree.leaves_with_path(new_p))
    for path, leaf_ref in jax.tree.leaves_with_path(p_ref):
        key = jax.tree_util.keystr(path)
        atol = 5e-3 if key in degenerate else 5e-5
        np.testing.assert_allclose(
            np.asarray(flat_new[path]), np.asarray(leaf_ref), atol=atol,
            err_msg=f"params mismatch at {key}",
        )
    flat_m = dict(jax.tree.leaves_with_path(new_m))
    for path, leaf_ref in jax.tree.leaves_with_path(opt["m"]):
        key = jax.tree_util.keystr(path)
        atol = 5e-3 if key in degenerate else 5e-5
        np.testing.assert_allclose(
            np.asarray(flat_m[path]), np.asarray(leaf_ref), atol=atol,
            err_msg=f"m mismatch at {key}",
        )
    for enc, bkey in (("encoder_a", "bn"), ("encoder_b", "bn1"), ("encoder_b", "bn2")):
        for stat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(new_bn[enc][bkey][stat]),
                np.asarray(s_ref[enc][bkey][stat]),
                atol=2e-4, err_msg=f"bn mismatch at {enc}.{bkey}.{stat}",
            )


def test_prng_mode_statistically_matches_xla_path(rng):
    """The megakernel's PRODUCTION noise path (in-kernel TPU PRNG) must land
    in the same optimization basin as the XLA path (threefry): same data,
    same init, 10 epochs.

    Calibration (measured): XLA-path seed-to-seed spread at this config is
    484-494; the HARDWARE megakernel lands at 488.9 (within the band, <1%),
    and at the full 200-epoch production config the two paths' final val
    losses agree to 0.002% (17400.32 vs 17399.97 on v5e). The INTERPRET-mode
    TPU PRNG (CPU CI) is statistically different noise and lands ~27% high,
    so off-TPU this test only asserts a loose catastrophic-breakage envelope
    (a wrong dropout scale or collapsed noise shows up as 2-10x)."""
    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.data.dataset import MultiModalArrays
    from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
    from vae_los_angeles_tpu.training import engine

    cfg = Config(
        input_dim_a=DIM_A, input_dim_b=DIM_B, latent_dim=LATENT,
        batch_size=16, num_epochs=10, patience=10_000,
    )
    tpm, beta, site = generate_synthetic_arrays(
        160, DIM_A, DIM_B, N_SITES, seed=7
    )
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))
    train, val = arrays.take(jnp.arange(128)), arrays.take(jnp.arange(128, 160))

    res_xla = engine.fit(
        "rna2dna", cfg, train, val, jax.random.PRNGKey(3), N_SITES,
        num_epochs=10,
    )
    res_prng = engine.fit(
        "rna2dna", cfg, train, val, jax.random.PRNGKey(3), N_SITES,
        num_epochs=10, fused_epoch=True,
    )
    v_xla = float(np.asarray(res_xla.val_losses)[-1])
    v_prng = float(np.asarray(res_prng.val_losses)[-1])
    tol = 0.10 if jax.default_backend() == "tpu" else 0.60
    assert abs(v_prng - v_xla) / v_xla < tol, (v_prng, v_xla)


def test_epoch_kernel_rejects_indivisible_rows():
    """Row counts not divisible by n_batches would silently drop samples and
    shift every batch boundary — the wrappers must refuse."""
    import pytest

    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.ops.pallas.fused_epoch import rna2dna_fused_epoch
    from vae_los_angeles_tpu.training.tasks import TASKS

    cfg = Config(input_dim_a=12, input_dim_b=16, latent_dim=4)
    params, state = TASKS["rna2dna"].init(jax.random.PRNGKey(0), cfg, 3)
    opt_m = jax.tree.map(jnp.zeros_like, params)
    opt_v = jax.tree.map(jnp.zeros_like, params)
    x = jnp.zeros((10, 12), jnp.float32)  # 10 rows, n_batches=3 → refuse
    t = jnp.zeros((10, 16), jnp.float32)
    s = jnp.zeros((10,), jnp.int32)
    with pytest.raises(ValueError, match="not divisible"):
        rna2dna_fused_epoch(
            params, opt_m, opt_v, state, x, t, s, 3, n_batches=3
        )
