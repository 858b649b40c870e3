"""Directional VAEs for cross-modal imputation (reference
``src/models/directional_vae.py``).

  * RNA2DNAVAE (reference :12-60): EncoderA(rna) + EncoderC(site) →
    mean-fused posterior → z → DecoderB(dna, sigmoid head).
  * DNA2RNAVAE (reference :63-111): EncoderB(dna) + EncoderC(site) →
    mean-fused posterior → z → DecoderA(rna, linear head).

Both tolerate a missing modality (``site=None`` is used at inference by the
unmatched-cohort reconstruction path, reference reconstruct_unmatched.py:193);
as with the tri-modal model the subset is static, so each combination traces
to its own XLA executable.
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
from vae_los_angeles_tpu.models.encoders import (
    encoder_a_apply,
    encoder_a_init,
    encoder_b_apply,
    encoder_b_init,
    encoder_c_apply,
    encoder_c_init,
)
from vae_los_angeles_tpu.models.vae import fuse_posteriors, reparameterize
from vae_los_angeles_tpu.ops.nn import sigmoid


class DirectionalVAEOutput(NamedTuple):
    recon: jnp.ndarray  # reconstructed target modality (probs for DNA)
    recon_logits: jnp.ndarray  # pre-activation output (== recon for RNA)
    mu: jnp.ndarray
    logvar: jnp.ndarray
    state: dict


# ---------------------------------------------------------------------------
# RNA → DNA
# ---------------------------------------------------------------------------


def rna2dna_vae_init(
    key, rna_dim: int, dna_dim: int, n_sites: int, latent_dim: int, embed_dim: int = 32
):
    k1, k2, k3 = jax.random.split(key, 3)
    enc_rna_p, enc_rna_s = encoder_a_init(k1, rna_dim, latent_dim)
    enc_site_p, _ = encoder_c_init(k2, n_sites, latent_dim, embed_dim)
    params = {
        "encoder_rna": enc_rna_p,
        "encoder_site": enc_site_p,
        "decoder_dna": decoder_b_init(k3, latent_dim, dna_dim),
    }
    state = {"encoder_rna": enc_rna_s}
    return params, state


def rna2dna_vae_apply(
    params,
    state,
    key,
    rna: Optional[jnp.ndarray] = None,
    site: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    noise_scale=None,
    row_mask=None,
) -> DirectionalVAEOutput:
    if rna is None and site is None:
        raise ValueError("at least one of rna/site must be provided")
    if key is None:
        key = jax.random.PRNGKey(0)
    k_drop, k_z = jax.random.split(key)

    mu_list, logvar_list = [], []
    new_state = dict(state)
    if rna is not None:
        mu_r, lv_r, new_state["encoder_rna"] = encoder_a_apply(
            params["encoder_rna"], state["encoder_rna"], rna, train=train,
            key=k_drop, row_mask=row_mask,
        )
        mu_list.append(mu_r)
        logvar_list.append(lv_r)
    if site is not None:
        mu_s, lv_s, _ = encoder_c_apply(params["encoder_site"], {}, site)
        mu_list.append(mu_s)
        logvar_list.append(lv_s)

    mu, logvar = fuse_posteriors(mu_list, logvar_list)
    z = reparameterize(k_z, mu, logvar, noise_scale)
    logits = decoder_b_apply_logits(params["decoder_dna"], z)
    return DirectionalVAEOutput(
        recon=sigmoid(logits), recon_logits=logits, mu=mu, logvar=logvar, state=new_state
    )


# ---------------------------------------------------------------------------
# DNA → RNA
# ---------------------------------------------------------------------------


def dna2rna_vae_init(
    key, rna_dim: int, dna_dim: int, n_sites: int, latent_dim: int, embed_dim: int = 32
):
    k1, k2, k3 = jax.random.split(key, 3)
    enc_dna_p, enc_dna_s = encoder_b_init(k1, dna_dim, latent_dim)
    enc_site_p, _ = encoder_c_init(k2, n_sites, latent_dim, embed_dim)
    params = {
        "encoder_dna": enc_dna_p,
        "encoder_site": enc_site_p,
        "decoder_rna": decoder_a_init(k3, latent_dim, rna_dim),
    }
    state = {"encoder_dna": enc_dna_s}
    return params, state


def dna2rna_vae_apply(
    params,
    state,
    key,
    dna: Optional[jnp.ndarray] = None,
    site: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    noise_scale=None,
    row_mask=None,
) -> DirectionalVAEOutput:
    if dna is None and site is None:
        raise ValueError("at least one of dna/site must be provided")
    if key is None:
        key = jax.random.PRNGKey(0)
    k_drop, k_z = jax.random.split(key)

    mu_list, logvar_list = [], []
    new_state = dict(state)
    if dna is not None:
        mu_d, lv_d, new_state["encoder_dna"] = encoder_b_apply(
            params["encoder_dna"], state["encoder_dna"], dna, train=train,
            key=k_drop, row_mask=row_mask,
        )
        mu_list.append(mu_d)
        logvar_list.append(lv_d)
    if site is not None:
        mu_s, lv_s, _ = encoder_c_apply(params["encoder_site"], {}, site)
        mu_list.append(mu_s)
        logvar_list.append(lv_s)

    mu, logvar = fuse_posteriors(mu_list, logvar_list)
    z = reparameterize(k_z, mu, logvar, noise_scale)
    recon = decoder_a_apply(params["decoder_rna"], z)
    return DirectionalVAEOutput(
        recon=recon, recon_logits=recon, mu=mu, logvar=logvar, state=new_state
    )
