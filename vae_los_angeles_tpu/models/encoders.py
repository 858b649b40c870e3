"""Encoder modules for the multi-modal VAE family.

Pure init/apply pairs with the same architectures as the reference
(``src/models/encoders.py``):

  * EncoderA (RNA, reference :8-23): Linear(in,128) → BatchNorm1d → ReLU →
    Dropout(0.1), then mu/logvar heads Linear(128, latent).
  * EncoderB (DNA, reference :26-46): in → 512 → 256, each block
    Linear → BN → ReLU → Dropout(0.1); mu/logvar heads Linear(256, latent).
  * EncoderC (site, reference :49-61): Embedding(n_sites, embed_dim=32) →
    mu/logvar heads Linear(embed_dim, latent).

Apply fns take (params, state, x, train, key) and return (mu, logvar,
new_state); `state` carries BatchNorm running stats explicitly so the same
code runs under jit, scan and fold/trial-level vmap (SURVEY hard-part #1).
"""

from __future__ import annotations

import jax

from vae_los_angeles_tpu.ops.nn import (
    batchnorm_apply,
    batchnorm_init,
    dropout_apply,
    embedding_apply,
    embedding_init,
    linear_apply,
    linear_init,
    relu,
)

DROPOUT_RATE = 0.1


def encoder_a_init(key, input_dim: int, latent_dim: int):
    k1, k2, k3 = jax.random.split(key, 3)
    bn_p, bn_s = batchnorm_init(128)
    params = {
        "fc": linear_init(k1, input_dim, 128),
        "bn": bn_p,
        "mu": linear_init(k2, 128, latent_dim),
        "logvar": linear_init(k3, 128, latent_dim),
    }
    state = {"bn": bn_s}
    return params, state


def encoder_a_apply(params, state, x, *, train: bool, key=None, row_mask=None):
    # row_mask: train-mode BN statistics over valid rows only — the masked
    # fold-population hook (see ops.nn.batchnorm_apply)
    h = linear_apply(params["fc"], x)
    h, bn_s = batchnorm_apply(params["bn"], state["bn"], h, train=train,
                              row_mask=row_mask)
    h = relu(h)
    h = dropout_apply(key, h, DROPOUT_RATE, train=train)
    return (
        linear_apply(params["mu"], h),
        linear_apply(params["logvar"], h),
        {"bn": bn_s},
    )


def encoder_b_init(key, input_dim: int, latent_dim: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bn1_p, bn1_s = batchnorm_init(512)
    bn2_p, bn2_s = batchnorm_init(256)
    params = {
        "fc1": linear_init(k1, input_dim, 512),
        "bn1": bn1_p,
        "fc2": linear_init(k2, 512, 256),
        "bn2": bn2_p,
        "mu": linear_init(k3, 256, latent_dim),
        "logvar": linear_init(k4, 256, latent_dim),
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def encoder_b_apply(params, state, x, *, train: bool, key=None, row_mask=None):
    x = x.reshape(x.shape[0], -1)  # flatten (reference encoders.py:44)
    if key is not None:
        k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None
    h = linear_apply(params["fc1"], x)
    h, bn1_s = batchnorm_apply(params["bn1"], state["bn1"], h, train=train,
                               row_mask=row_mask)
    h = relu(h)
    h = dropout_apply(k1, h, DROPOUT_RATE, train=train)
    h = linear_apply(params["fc2"], h)
    h, bn2_s = batchnorm_apply(params["bn2"], state["bn2"], h, train=train,
                               row_mask=row_mask)
    h = relu(h)
    h = dropout_apply(k2, h, DROPOUT_RATE, train=train)
    return (
        linear_apply(params["mu"], h),
        linear_apply(params["logvar"], h),
        {"bn1": bn1_s, "bn2": bn2_s},
    )


def encoder_c_init(key, n_sites: int, latent_dim: int, embed_dim: int = 32):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "embedding": embedding_init(k1, n_sites, embed_dim),
        "mu": linear_init(k2, embed_dim, latent_dim),
        "logvar": linear_init(k3, embed_dim, latent_dim),
    }
    return params, {}


def encoder_c_apply(params, state, site, *, train: bool = False, key=None):
    h = embedding_apply(params["embedding"], site)
    return linear_apply(params["mu"], h), linear_apply(params["logvar"], h), state
