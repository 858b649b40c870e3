"""Directional (deterministic) autoencoders for imputation (reference
``src/models/directional_ae.py``).

  * RNA2DNAAE (reference :10-68): encoder Linear(rna,128)→BN→ReLU→Dropout→
    Linear(128,latent); site path Embedding(n_sites,embed)→Linear(embed,latent);
    mean-fused latent → DecoderB. No mu/logvar.
  * DNA2RNAAE (reference :71-134): encoder dna→512→256→latent (two
    BN/ReLU/Dropout blocks) + site path → DecoderA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vae_los_angeles_tpu.models.decoders import (
    decoder_a_apply,
    decoder_a_init,
    decoder_b_apply_logits,
    decoder_b_init,
)
from vae_los_angeles_tpu.ops.nn import (
    batchnorm_apply,
    batchnorm_init,
    dropout_apply,
    embedding_apply,
    embedding_init,
    linear_apply,
    linear_init,
    relu,
    sigmoid,
)

DROPOUT_RATE = 0.1


class DirectionalAEOutput(NamedTuple):
    recon: jnp.ndarray
    recon_logits: jnp.ndarray
    latent: jnp.ndarray
    state: dict


def _fuse_latents(latent_list):
    if len(latent_list) == 1:
        return latent_list[0]
    return jnp.mean(jnp.stack(latent_list), axis=0)


# ---------------------------------------------------------------------------
# RNA → DNA AE
# ---------------------------------------------------------------------------


def rna2dna_ae_init(
    key, rna_dim: int, dna_dim: int, n_sites: int, latent_dim: int, embed_dim: int = 32
):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bn_p, bn_s = batchnorm_init(128)
    params = {
        "enc_fc1": linear_init(k1, rna_dim, 128),
        "enc_bn": bn_p,
        "enc_fc2": linear_init(k2, 128, latent_dim),
        "site_embedding": embedding_init(k3, n_sites, embed_dim),
        "site_projection": linear_init(k4, embed_dim, latent_dim),
        "decoder_dna": decoder_b_init(k5, latent_dim, dna_dim),
    }
    return params, {"enc_bn": bn_s}


def rna2dna_ae_apply(
    params,
    state,
    key,
    rna: Optional[jnp.ndarray] = None,
    site: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    row_mask=None,
) -> DirectionalAEOutput:
    if rna is None and site is None:
        raise ValueError("at least one of rna/site must be provided")
    latent_list = []
    new_state = dict(state)
    if rna is not None:
        h = linear_apply(params["enc_fc1"], rna)
        h, new_state["enc_bn"] = batchnorm_apply(
            params["enc_bn"], state["enc_bn"], h, train=train,
            row_mask=row_mask,
        )
        h = relu(h)
        h = dropout_apply(key, h, DROPOUT_RATE, train=train)
        latent_list.append(linear_apply(params["enc_fc2"], h))
    if site is not None:
        emb = embedding_apply(params["site_embedding"], site)
        latent_list.append(linear_apply(params["site_projection"], emb))
    latent = _fuse_latents(latent_list)
    logits = decoder_b_apply_logits(params["decoder_dna"], latent)
    return DirectionalAEOutput(
        recon=sigmoid(logits), recon_logits=logits, latent=latent, state=new_state
    )


# ---------------------------------------------------------------------------
# DNA → RNA AE
# ---------------------------------------------------------------------------


def dna2rna_ae_init(
    key, rna_dim: int, dna_dim: int, n_sites: int, latent_dim: int, embed_dim: int = 32
):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    bn1_p, bn1_s = batchnorm_init(512)
    bn2_p, bn2_s = batchnorm_init(256)
    params = {
        "enc_fc1": linear_init(k1, dna_dim, 512),
        "enc_bn1": bn1_p,
        "enc_fc2": linear_init(k2, 512, 256),
        "enc_bn2": bn2_p,
        "enc_fc3": linear_init(k3, 256, latent_dim),
        "site_embedding": embedding_init(k4, n_sites, embed_dim),
        "site_projection": linear_init(k5, embed_dim, latent_dim),
        "decoder_rna": decoder_a_init(k6, latent_dim, rna_dim),
    }
    return params, {"enc_bn1": bn1_s, "enc_bn2": bn2_s}


def dna2rna_ae_apply(
    params,
    state,
    key,
    dna: Optional[jnp.ndarray] = None,
    site: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    row_mask=None,
) -> DirectionalAEOutput:
    if dna is None and site is None:
        raise ValueError("at least one of dna/site must be provided")
    latent_list = []
    new_state = dict(state)
    if dna is not None:
        x = dna.reshape(dna.shape[0], -1)  # flatten (reference :113)
        if key is not None:
            kd1, kd2 = jax.random.split(key)
        else:
            kd1 = kd2 = None
        h = linear_apply(params["enc_fc1"], x)
        h, new_state["enc_bn1"] = batchnorm_apply(
            params["enc_bn1"], state["enc_bn1"], h, train=train,
            row_mask=row_mask,
        )
        h = relu(h)
        h = dropout_apply(kd1, h, DROPOUT_RATE, train=train)
        h = linear_apply(params["enc_fc2"], h)
        h, new_state["enc_bn2"] = batchnorm_apply(
            params["enc_bn2"], state["enc_bn2"], h, train=train,
            row_mask=row_mask,
        )
        h = relu(h)
        h = dropout_apply(kd2, h, DROPOUT_RATE, train=train)
        latent_list.append(linear_apply(params["enc_fc3"], h))
    if site is not None:
        emb = embedding_apply(params["site_embedding"], site)
        latent_list.append(linear_apply(params["site_projection"], emb))
    latent = _fuse_latents(latent_list)
    recon = decoder_a_apply(params["decoder_rna"], latent)
    return DirectionalAEOutput(
        recon=recon, recon_logits=recon, latent=latent, state=new_state
    )
