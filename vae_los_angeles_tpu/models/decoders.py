"""Decoder modules for the multi-modal VAE family.

Architectures from the reference (``src/models/decoders.py``):
  * DecoderA (RNA, reference :8-19): latent → 128 → ReLU → out, linear output.
  * DecoderB (DNA, reference :22-36): latent → 256 → ReLU → 512 → ReLU → out
    → Sigmoid (β-values in [0,1]).
  * DecoderC (site, reference :39-50): latent → 64 → ReLU → n_sites logits.

DecoderB's apply returns **logits**; callers apply sigmoid for the public
probability output while the training path feeds logits straight into the
numerically-stable BCE (`ops.losses.bce_with_logits_sum`). XLA fuses the
sigmoid into the matmul epilogue either way.
"""

from __future__ import annotations

import jax

from vae_los_angeles_tpu.ops.nn import linear_apply, linear_init, relu, sigmoid


def decoder_a_init(key, latent_dim: int, output_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, latent_dim, 128),
        "fc2": linear_init(k2, 128, output_dim),
    }


def decoder_a_apply(params, z):
    return linear_apply(params["fc2"], relu(linear_apply(params["fc1"], z)))


def decoder_b_init(key, latent_dim: int, output_dim: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": linear_init(k1, latent_dim, 256),
        "fc2": linear_init(k2, 256, 512),
        "fc3": linear_init(k3, 512, output_dim),
    }


def decoder_b_apply_logits(params, z):
    h = relu(linear_apply(params["fc1"], z))
    h = relu(linear_apply(params["fc2"], h))
    return linear_apply(params["fc3"], h)


def decoder_b_apply(params, z):
    """Probability output (matches the reference's Sigmoid head)."""
    return sigmoid(decoder_b_apply_logits(params, z))


def decoder_c_init(key, latent_dim: int, n_sites: int):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, latent_dim, 64),
        "fc2": linear_init(k2, 64, n_sites),
    }


def decoder_c_apply(params, z):
    return linear_apply(params["fc2"], relu(linear_apply(params["fc1"], z)))
