"""Equivalence test for the fully-fused Pallas TRAIN step: loss, every
parameter gradient, and the BatchNorm running-stats update must match
``jax.grad`` of an XLA reference forward that uses the SAME dropout mask and
reparameterization eps."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.models.directional_vae import rna2dna_vae_init
from vae_los_angeles_tpu.ops.losses import rna2dna_loss
from vae_los_angeles_tpu.ops.nn import batchnorm_apply, linear_apply, relu
from vae_los_angeles_tpu.ops.pallas.fused_train import rna2dna_fused_train_step

DIM_A, DIM_B, N_SITES, LATENT = 40, 56, 5, 8
KEEP = 0.9


def _ref_loss(params, bn_state, rna, dna, site, eps, drop_mask, beta):
    """XLA train-mode forward with injected noise (mirrors the kernel)."""
    enc = params["encoder_rna"]
    a1 = linear_apply(enc["fc"], rna)
    h, new_bn = batchnorm_apply(enc["bn"], bn_state, a1, train=True)
    d = relu(h) * drop_mask / KEEP
    mu_r = linear_apply(enc["mu"], d)
    lv_r = linear_apply(enc["logvar"], d)
    est = params["encoder_site"]
    e = jnp.take(est["embedding"]["table"], site, axis=0)
    mu_s = linear_apply(est["mu"], e)
    lv_s = linear_apply(est["logvar"], e)
    mu = 0.5 * (mu_r + mu_s)
    lv = 0.5 * (lv_r + lv_s)
    z = mu + eps * jnp.exp(0.5 * lv)
    dec = params["decoder_dna"]
    h1 = relu(linear_apply(dec["fc1"], z))
    h2 = relu(linear_apply(dec["fc2"], h1))
    logits = linear_apply(dec["fc3"], h2)
    loss, _ = rna2dna_loss(logits, dna, mu, lv, beta=beta)
    return loss, new_bn


def test_fused_train_step_matches_autodiff(rng):
    params, state = rna2dna_vae_init(
        jax.random.PRNGKey(0), DIM_A, DIM_B, N_SITES, LATENT
    )
    # non-trivial running stats
    state = jax.tree.map(
        lambda x: x + 0.2 * jax.random.uniform(jax.random.PRNGKey(1), x.shape), state
    )
    batch = 16
    rna = jnp.asarray(rng.normal(size=(batch, DIM_A)).astype(np.float32))
    dna = jnp.asarray(rng.uniform(0.02, 0.98, size=(batch, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(batch,)))
    eps = jnp.asarray(rng.normal(size=(batch, LATENT)).astype(np.float32))
    drop_mask = jnp.asarray(
        (rng.uniform(size=(batch, 128)) < KEEP).astype(np.float32)
    )
    beta = 1e-3

    loss_f, grads_f, new_state_f = rna2dna_fused_train_step(
        params, state, rna, dna, site, N_SITES,
        beta=beta, eps=eps, drop_mask=drop_mask,
    )

    bn_state = state["encoder_rna"]["bn"]
    (loss_ref, new_bn_ref), grads_ref = jax.value_and_grad(
        lambda p: _ref_loss(p, bn_state, rna, dna, site, eps, drop_mask, beta),
        has_aux=True,
    )(params)

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-5)
    # every parameter gradient
    flat_ref = jax.tree.leaves_with_path(grads_ref)
    flat_fused = dict(jax.tree.leaves_with_path(grads_f))
    assert len(flat_ref) == len(flat_fused) == 19
    for path, g_ref in flat_ref:
        g_fused = flat_fused[path]
        np.testing.assert_allclose(
            np.asarray(g_fused),
            np.asarray(g_ref),
            atol=5e-4,
            rtol=1e-4,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )
    # BatchNorm running-stats update
    np.testing.assert_allclose(
        np.asarray(new_state_f["encoder_rna"]["bn"]["mean"]),
        np.asarray(new_bn_ref["mean"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state_f["encoder_rna"]["bn"]["var"]),
        np.asarray(new_bn_ref["var"]),
        atol=1e-5,
    )


def test_fused_train_step_prng_mode_runs(rng):
    """Production mode (in-kernel PRNG noise) produces finite loss/grads."""
    params, state = rna2dna_vae_init(
        jax.random.PRNGKey(2), DIM_A, DIM_B, N_SITES, LATENT
    )
    rna = jnp.asarray(rng.normal(size=(8, DIM_A)).astype(np.float32))
    dna = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(8,)))
    loss, grads, new_state = rna2dna_fused_train_step(
        params, state, rna, dna, site, N_SITES, seed=3
    )
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def _ref_loss_d2r(params, bn_state, rna, dna, site, eps, drop1, drop2, beta):
    from vae_los_angeles_tpu.ops.losses import dna2rna_loss

    enc = params["encoder_dna"]
    a1 = linear_apply(enc["fc1"], dna)
    h1, new_bn1 = batchnorm_apply(enc["bn1"], bn_state["bn1"], a1, train=True)
    d1 = relu(h1) * drop1 / KEEP
    a2 = linear_apply(enc["fc2"], d1)
    h2, new_bn2 = batchnorm_apply(enc["bn2"], bn_state["bn2"], a2, train=True)
    d2 = relu(h2) * drop2 / KEEP
    mu_r = linear_apply(enc["mu"], d2)
    lv_r = linear_apply(enc["logvar"], d2)
    est = params["encoder_site"]
    e = jnp.take(est["embedding"]["table"], site, axis=0)
    mu = 0.5 * (mu_r + linear_apply(est["mu"], e))
    lv = 0.5 * (lv_r + linear_apply(est["logvar"], e))
    z = mu + eps * jnp.exp(0.5 * lv)
    dec = params["decoder_rna"]
    recon = linear_apply(dec["fc2"], relu(linear_apply(dec["fc1"], z)))
    loss, _ = dna2rna_loss(recon, rna, mu, lv, beta=beta)
    return loss, (new_bn1, new_bn2)


def test_fused_d2r_train_step_matches_autodiff(rng):
    from vae_los_angeles_tpu.models.directional_vae import dna2rna_vae_init
    from vae_los_angeles_tpu.ops.pallas.fused_train import dna2rna_fused_train_step

    params, state = dna2rna_vae_init(
        jax.random.PRNGKey(4), DIM_A, DIM_B, N_SITES, LATENT
    )
    state = jax.tree.map(
        lambda x: x + 0.2 * jax.random.uniform(jax.random.PRNGKey(5), x.shape), state
    )
    batch = 16
    rna = jnp.asarray(rng.normal(size=(batch, DIM_A)).astype(np.float32))
    dna = jnp.asarray(rng.uniform(0.02, 0.98, size=(batch, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(batch,)))
    eps = jnp.asarray(rng.normal(size=(batch, LATENT)).astype(np.float32))
    drop1 = jnp.asarray((rng.uniform(size=(batch, 512)) < KEEP).astype(np.float32))
    drop2 = jnp.asarray((rng.uniform(size=(batch, 256)) < KEEP).astype(np.float32))
    beta = 1e-3

    loss_f, grads_f, new_state_f = dna2rna_fused_train_step(
        params, state, rna, dna, site, N_SITES,
        beta=beta, eps=eps, drop_mask1=drop1, drop_mask2=drop2,
    )

    bn_state = state["encoder_dna"]
    (loss_ref, (bn1_ref, bn2_ref)), grads_ref = jax.value_and_grad(
        lambda p: _ref_loss_d2r(p, bn_state, rna, dna, site, eps, drop1, drop2, beta),
        has_aux=True,
    )(params)

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-5)
    flat_fused = dict(jax.tree.leaves_with_path(grads_f))
    for path, g_ref in jax.tree.leaves_with_path(grads_ref):
        np.testing.assert_allclose(
            np.asarray(flat_fused[path]), np.asarray(g_ref),
            atol=1e-3, rtol=1e-4,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )
    np.testing.assert_allclose(
        np.asarray(new_state_f["encoder_dna"]["bn1"]["var"]),
        np.asarray(bn1_ref["var"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state_f["encoder_dna"]["bn2"]["mean"]),
        np.asarray(bn2_ref["mean"]), atol=1e-5,
    )
