"""Equivalence tests for the fused Pallas inference kernel (interpreter mode
on CPU; the same code compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.models.directional_vae import (
    rna2dna_vae_apply,
    rna2dna_vae_init,
)
from vae_los_angeles_tpu.ops.pallas.fused_vae import FusedRNA2DNA, fold_bn_eval

DIM_A, DIM_B, N_SITES, LATENT = 40, 56, 5, 8


@pytest.fixture(scope="module")
def model():
    params, state = rna2dna_vae_init(
        jax.random.PRNGKey(0), DIM_A, DIM_B, N_SITES, LATENT
    )
    # randomize BN running stats so the folded path is non-trivial
    state = jax.tree.map(
        lambda x: x + 0.1 * jax.random.uniform(jax.random.PRNGKey(1), x.shape), state
    )
    return params, state


def test_fold_bn_eval_matches_unfused(model, rng):
    from vae_los_angeles_tpu.ops.nn import batchnorm_apply, linear_apply

    params, state = model
    x = jnp.asarray(rng.normal(size=(8, DIM_A)).astype(np.float32))
    w, b = fold_bn_eval(
        params["encoder_rna"]["fc"],
        params["encoder_rna"]["bn"],
        state["encoder_rna"]["bn"],
    )
    got = jnp.dot(x, w) + b
    h = linear_apply(params["encoder_rna"]["fc"], x)
    want, _ = batchnorm_apply(
        params["encoder_rna"]["bn"], state["encoder_rna"]["bn"], h, train=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_deterministic_path_matches_xla(model, rng):
    """With noise disabled (z = mu), the fused kernel must match the unfused
    apply (which we evaluate at z = mu by zeroing logvar's effect via eps=0 —
    achieved by decoding mu directly)."""
    from vae_los_angeles_tpu.models.decoders import decoder_b_apply
    from vae_los_angeles_tpu.models.encoders import encoder_a_apply, encoder_c_apply

    params, state = model
    fused = FusedRNA2DNA(params, state)
    rna = jnp.asarray(rng.normal(size=(16, DIM_A)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(16,)))

    recon, mu, logvar = fused(rna, site, use_noise=False)

    # reference: encoders → mean-fuse → decode at z = mu
    mu_r, lv_r, _ = encoder_a_apply(
        params["encoder_rna"], state["encoder_rna"], rna, train=False
    )
    mu_s, lv_s, _ = encoder_c_apply(params["encoder_site"], {}, site)
    mu_want = 0.5 * (mu_r + mu_s)
    lv_want = 0.5 * (lv_r + lv_s)
    recon_want = decoder_b_apply(params["decoder_dna"], mu_want)

    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), np.asarray(lv_want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon_want), atol=1e-4)


def test_fused_no_site_path(model, rng):
    params, state = model
    fused = FusedRNA2DNA(params, state)
    rna = jnp.asarray(rng.normal(size=(8, DIM_A)).astype(np.float32))
    recon, mu, logvar = fused(rna, site=None, use_noise=False)
    out = rna2dna_vae_apply(params, state, jax.random.PRNGKey(0), rna=rna)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(out.mu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), np.asarray(out.logvar), atol=1e-4)


def test_fused_dna2rna_deterministic_path(model, rng):
    """DNA→RNA fused kernel matches the unfused apply at z = mu."""
    from vae_los_angeles_tpu.models.decoders import decoder_a_apply
    from vae_los_angeles_tpu.models.directional_vae import dna2rna_vae_init
    from vae_los_angeles_tpu.models.encoders import encoder_b_apply, encoder_c_apply
    from vae_los_angeles_tpu.ops.pallas.fused_vae import FusedDNA2RNA

    params, state = dna2rna_vae_init(
        jax.random.PRNGKey(7), DIM_A, DIM_B, N_SITES, LATENT
    )
    state = jax.tree.map(
        lambda x: x + 0.1 * jax.random.uniform(jax.random.PRNGKey(8), x.shape), state
    )
    fused = FusedDNA2RNA(params, state)
    dna = jnp.asarray(rng.uniform(size=(16, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(16,)))

    recon, mu, logvar = fused(dna, site, use_noise=False)

    mu_d, lv_d, _ = encoder_b_apply(
        params["encoder_dna"], state["encoder_dna"], dna, train=False
    )
    mu_s, lv_s, _ = encoder_c_apply(params["encoder_site"], {}, site)
    mu_want = 0.5 * (mu_d + mu_s)
    recon_want = decoder_a_apply(params["decoder_rna"], mu_want)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_want), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logvar), np.asarray(0.5 * (lv_d + lv_s)), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon_want), atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU interpreter's PRNG is not faithful (same bits per seed/row); "
    "the stochastic path is validated on real TPU hardware",
)
def test_fused_sampling_statistics(model):
    """In-kernel Box–Muller: z-samples distributed as N(mu, exp(logvar))."""
    params, state = model
    fused = FusedRNA2DNA(params, state)
    rna = jnp.zeros((256, DIM_A), jnp.float32)
    site = jnp.zeros((256,), jnp.int32)
    _, mu, logvar = fused(rna, site, use_noise=False)

    # many seeds → estimate mean/std of recon-input z via the latent heads
    recons = []
    for seed in range(6):
        r, _, _ = fused(rna, site, seed=seed, use_noise=True)
        recons.append(np.asarray(r))
    recons = np.stack(recons)
    det, _, _ = fused(rna, site, use_noise=False)
    # stochastic outputs vary across seeds and bracket the deterministic one
    assert recons.std(axis=0).mean() > 1e-4
    assert not np.allclose(recons[0], recons[1])
    assert np.all(recons >= 0) and np.all(recons <= 1)
    # mean over seeds is closer to the deterministic decode than any sample
    err_mean = np.abs(recons.mean(axis=0) - np.asarray(det)).mean()
    err_single = np.abs(recons[0] - np.asarray(det)).mean()
    assert err_mean < err_single


def test_fused_loss_value_and_grads(rng):
    """Fused loss kernel + analytic VJP ≡ autodiff of ops.losses.rna2dna_loss."""
    from vae_los_angeles_tpu.ops.losses import rna2dna_loss
    from vae_los_angeles_tpu.ops.pallas.fused_loss import rna2dna_loss_fused

    logits = jnp.asarray(rng.normal(size=(16, 48)).astype(np.float32)) * 2
    dna = jnp.asarray(rng.uniform(0.02, 0.98, size=(16, 48)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    beta = 1e-3

    want = float(rna2dna_loss(logits, dna, mu, logvar, beta=beta)[0])
    got = float(rna2dna_loss_fused(logits, dna, mu, logvar, beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    ref_grads = jax.grad(
        lambda l, m, lv: rna2dna_loss(l, dna, m, lv, beta=beta)[0], argnums=(0, 1, 2)
    )(logits, mu, logvar)
    fused_grads = jax.grad(
        lambda l, m, lv: rna2dna_loss_fused(l, dna, m, lv, beta), argnums=(0, 1, 2)
    )(logits, mu, logvar)
    for g_ref, g_fused in zip(ref_grads, fused_grads):
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), atol=1e-5
        )


def test_fused_loss_traced_beta(rng):
    """β must be a differentiable (traceable) argument: the engine's KL-warmup
    β is a tracer inside lax.scan, and dL/dβ = KLD analytically."""
    from vae_los_angeles_tpu.ops.losses import rna2dna_loss
    from vae_los_angeles_tpu.ops.pallas.fused_loss import rna2dna_loss_fused

    logits = jnp.asarray(rng.normal(size=(8, 24)).astype(np.float32))
    dna = jnp.asarray(rng.uniform(0.05, 0.95, size=(8, 24)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))

    # traced beta through scan (exactly the engine's warmup pattern)
    def body(carry, beta_t):
        loss, g = jax.value_and_grad(
            lambda m: rna2dna_loss_fused(logits, dna, m, logvar, beta_t)
        )(mu)
        return carry, (loss, g)

    _, (losses, _) = jax.lax.scan(
        body, 0.0, jnp.asarray([1e-4, 5e-4, 1e-3], jnp.float32)
    )
    for i, b in enumerate([1e-4, 5e-4, 1e-3]):
        want = float(rna2dna_loss(logits, dna, mu, logvar, beta=b)[0])
        np.testing.assert_allclose(float(losses[i]), want, rtol=1e-5)

    # dL/dβ equals the KLD term
    dbeta = jax.grad(
        lambda b: rna2dna_loss_fused(logits, dna, mu, logvar, b)
    )(jnp.float32(1e-3))
    kld = -0.5 * float(
        jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar))
    )
    np.testing.assert_allclose(float(dbeta), kld, rtol=1e-5)
