"""Equivalence test for the tri-modal fused train step: loss, all 39
parameter gradients (MSE + BCE + γ·weighted-CE + β·KL backward through three
encoders and three decoders) and the BN running-stats updates must match
``jax.grad`` of an XLA reference with identical injected noise."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.models.vae import multimodal_vae_init
from vae_los_angeles_tpu.ops.losses import vae_loss
from vae_los_angeles_tpu.ops.nn import batchnorm_apply, linear_apply, relu
from vae_los_angeles_tpu.ops.pallas.fused_train_multimodal import (
    multimodal_fused_train_step,
)

DIM_A, DIM_B, N_SITES, LATENT, EMBED = 36, 52, 5, 8, 16
KEEP = 0.9


def _ref_loss(params, state, a, b, site, eps, drop_a, drop_b1, drop_b2,
              beta, gamma, class_weights):
    enc_a = params["encoder_a"]
    ah = linear_apply(enc_a["fc"], a)
    ah, bn_a = batchnorm_apply(enc_a["bn"], state["encoder_a"]["bn"], ah, train=True)
    ad = relu(ah) * drop_a / KEEP
    mu_a = linear_apply(enc_a["mu"], ad)
    lv_a = linear_apply(enc_a["logvar"], ad)

    enc_b = params["encoder_b"]
    bh = linear_apply(enc_b["fc1"], b)
    bh, bn_b1 = batchnorm_apply(enc_b["bn1"], state["encoder_b"]["bn1"], bh, train=True)
    bd1 = relu(bh) * drop_b1 / KEEP
    bh2 = linear_apply(enc_b["fc2"], bd1)
    bh2, bn_b2 = batchnorm_apply(
        enc_b["bn2"], state["encoder_b"]["bn2"], bh2, train=True
    )
    bd2 = relu(bh2) * drop_b2 / KEEP
    mu_b = linear_apply(enc_b["mu"], bd2)
    lv_b = linear_apply(enc_b["logvar"], bd2)

    enc_c = params["encoder_c"]
    e = jnp.take(enc_c["embedding"]["table"], site, axis=0)
    mu_c = linear_apply(enc_c["mu"], e)
    lv_c = linear_apply(enc_c["logvar"], e)

    mu = (mu_a + mu_b + mu_c) / 3.0
    lv = (lv_a + lv_b + lv_c) / 3.0
    z = mu + eps * jnp.exp(0.5 * lv)

    dec_a = params["decoder_a"]
    recon_a = linear_apply(dec_a["fc2"], relu(linear_apply(dec_a["fc1"], z)))
    dec_b = params["decoder_b"]
    h = relu(linear_apply(dec_b["fc1"], z))
    h = relu(linear_apply(dec_b["fc2"], h))
    logits_b = linear_apply(dec_b["fc3"], h)
    dec_c = params["decoder_c"]
    logits_c = linear_apply(dec_c["fc2"], relu(linear_apply(dec_c["fc1"], z)))

    total, _ = vae_loss(
        recon_a, a, logits_b, b, logits_c, site, mu, lv,
        beta=beta, gamma=gamma, class_weights=class_weights,
    )
    return total, (bn_a, bn_b1, bn_b2)


def test_multimodal_fused_step_matches_autodiff(rng):
    params, state = multimodal_vae_init(
        jax.random.PRNGKey(0), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    state = jax.tree.map(
        lambda x: x + 0.2 * jax.random.uniform(jax.random.PRNGKey(1), x.shape), state
    )
    batch = 16
    a = jnp.asarray(rng.normal(size=(batch, DIM_A)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.02, 0.98, size=(batch, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(batch,)))
    eps = jnp.asarray(rng.normal(size=(batch, LATENT)).astype(np.float32))
    drop_a = jnp.asarray((rng.uniform(size=(batch, 128)) < KEEP).astype(np.float32))
    drop_b1 = jnp.asarray((rng.uniform(size=(batch, 512)) < KEEP).astype(np.float32))
    drop_b2 = jnp.asarray((rng.uniform(size=(batch, 256)) < KEEP).astype(np.float32))
    beta, gamma = 1e-3, 1.7
    cw = jnp.asarray(rng.uniform(0.5, 2.0, size=N_SITES).astype(np.float32))

    loss_f, grads_f, new_state_f = multimodal_fused_train_step(
        params, state, a, b, site, N_SITES,
        beta=beta, gamma=gamma, class_weights=cw,
        eps=eps, drop_a=drop_a, drop_b1=drop_b1, drop_b2=drop_b2,
    )

    (loss_ref, (bn_a, bn_b1, bn_b2)), grads_ref = jax.value_and_grad(
        lambda p: _ref_loss(
            p, state, a, b, site, eps, drop_a, drop_b1, drop_b2, beta, gamma, cw
        ),
        has_aux=True,
    )(params)

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-5)
    # biases feeding train-mode BN have analytically-zero gradients →
    # fp32 cancellation noise; compare those loosely
    degenerate = {
        "['encoder_a']['fc']['b']",
        "['encoder_b']['fc1']['b']",
        "['encoder_b']['fc2']['b']",
    }
    flat_fused = dict(jax.tree.leaves_with_path(grads_f))
    flat_ref = jax.tree.leaves_with_path(grads_ref)
    assert len(flat_ref) == len(flat_fused) == 39
    for path, g_ref in flat_ref:
        key = jax.tree_util.keystr(path)
        atol = 2e-3 if key in degenerate else 1e-3
        np.testing.assert_allclose(
            np.asarray(flat_fused[path]), np.asarray(g_ref), atol=atol, rtol=1e-4,
            err_msg=f"gradient mismatch at {key}",
        )
    np.testing.assert_allclose(
        np.asarray(new_state_f["encoder_a"]["bn"]["var"]),
        np.asarray(bn_a["var"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state_f["encoder_b"]["bn2"]["mean"]),
        np.asarray(bn_b2["mean"]), atol=1e-5,
    )


def test_multimodal_fused_step_prng_mode(rng):
    params, state = multimodal_vae_init(
        jax.random.PRNGKey(3), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    a = jnp.asarray(rng.normal(size=(8, DIM_A)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(8,)))
    loss, grads, new_state = multimodal_fused_train_step(
        params, state, a, b, site, N_SITES, seed=5
    )
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
