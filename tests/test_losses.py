"""Loss parity vs torch formulas (reference src/utils/*.py, SURVEY §2)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vae_los_angeles_tpu.ops import losses


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def test_kld_matches_torch(rng):
    mu = _rand(rng, 8, 20)
    logvar = _rand(rng, 8, 20)
    want = (
        -0.5
        * torch.sum(
            1
            + torch.from_numpy(logvar)
            - torch.from_numpy(mu).pow(2)
            - torch.from_numpy(logvar).exp()
        )
    ).item()
    got = float(losses.kl_divergence(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_logits_equals_torch_prob_bce(rng):
    logits = _rand(rng, 16, 30) * 3
    target = rng.uniform(0.01, 0.99, size=(16, 30)).astype(np.float32)
    want = F.binary_cross_entropy(
        torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(target), reduction="sum"
    ).item()
    got = float(losses.bce_with_logits_sum(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # prob-space variant agrees too
    probs = 1.0 / (1.0 + np.exp(-logits))
    got_p = float(losses.bce_sum(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got_p, want, rtol=1e-4)


def test_cross_entropy_weighted_sum(rng):
    logits = _rand(rng, 12, 7)
    labels = rng.integers(0, 7, size=(12,))
    weights = rng.uniform(0.5, 2.0, size=(7,)).astype(np.float32)
    want = F.cross_entropy(
        torch.from_numpy(logits),
        torch.from_numpy(labels),
        weight=torch.from_numpy(weights),
        reduction="sum",
    ).item()
    got = float(
        losses.cross_entropy_sum(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vae_loss_total(rng):
    a = _rand(rng, 8, 10)
    ra = _rand(rng, 8, 10)
    b = rng.uniform(0.01, 0.99, size=(8, 12)).astype(np.float32)
    rb_logits = _rand(rng, 8, 12)
    rc = _rand(rng, 8, 5)
    site = rng.integers(0, 5, size=(8,))
    mu = _rand(rng, 8, 4)
    logvar = _rand(rng, 8, 4)
    beta, gamma = 1e-3, 1.7

    t_recon = F.mse_loss(
        torch.from_numpy(ra), torch.from_numpy(a), reduction="sum"
    ) + F.binary_cross_entropy(
        torch.sigmoid(torch.from_numpy(rb_logits)), torch.from_numpy(b), reduction="sum"
    )
    t_class = F.cross_entropy(
        torch.from_numpy(rc), torch.from_numpy(site), reduction="sum"
    )
    t_kld = -0.5 * torch.sum(
        1
        + torch.from_numpy(logvar)
        - torch.from_numpy(mu).pow(2)
        - torch.from_numpy(logvar).exp()
    )
    want = (t_recon + gamma * t_class + beta * t_kld).item()

    total, aux = losses.vae_loss(
        jnp.asarray(ra),
        jnp.asarray(a),
        jnp.asarray(rb_logits),
        jnp.asarray(b),
        jnp.asarray(rc),
        jnp.asarray(site),
        jnp.asarray(mu),
        jnp.asarray(logvar),
        beta=beta,
        gamma=gamma,
    )
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    np.testing.assert_allclose(float(aux["recon"]), t_recon.item(), rtol=1e-5)


def test_directional_and_ae_losses(rng):
    dna = rng.uniform(0.01, 0.99, size=(6, 9)).astype(np.float32)
    logits = _rand(rng, 6, 9)
    rna = _rand(rng, 6, 11)
    recon_rna = _rand(rng, 6, 11)
    mu = _rand(rng, 6, 3)
    logvar = _rand(rng, 6, 3)

    t_bce = F.binary_cross_entropy(
        torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(dna), reduction="sum"
    ).item()
    t_mse = F.mse_loss(
        torch.from_numpy(recon_rna), torch.from_numpy(rna), reduction="sum"
    ).item()
    t_kld = (
        -0.5
        * torch.sum(
            1
            + torch.from_numpy(logvar)
            - torch.from_numpy(mu).pow(2)
            - torch.from_numpy(logvar).exp()
        ).item()
    )

    total, _ = losses.rna2dna_loss(
        jnp.asarray(logits), jnp.asarray(dna), jnp.asarray(mu), jnp.asarray(logvar)
    )
    np.testing.assert_allclose(float(total), t_bce + 1e-3 * t_kld, rtol=1e-5)

    total, _ = losses.dna2rna_loss(
        jnp.asarray(recon_rna), jnp.asarray(rna), jnp.asarray(mu), jnp.asarray(logvar)
    )
    np.testing.assert_allclose(float(total), t_mse + 1e-3 * t_kld, rtol=1e-5)

    total, _ = losses.rna2dna_ae_loss(jnp.asarray(logits), jnp.asarray(dna))
    np.testing.assert_allclose(float(total), t_bce, rtol=1e-5)
    total, _ = losses.dna2rna_ae_loss(jnp.asarray(recon_rna), jnp.asarray(rna))
    np.testing.assert_allclose(float(total), t_mse, rtol=1e-5)
