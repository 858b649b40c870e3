"""Tri-modal MultiModalVAE (reference ``src/models/vae.py``).

Three encoders (RNA, DNA, site) whose posteriors are fused by **arithmetic
mean** of mus and logvars — not product-of-experts (reference vae.py:64-71) —
then a single reparameterized z decodes all three modalities
(reference vae.py:73-77).

Optional-modality handling (SURVEY hard-part #5): the reference's
``if x is not None`` Python control flow maps to *static* Nones here — each
of the 7 modality-subset combinations traces to its own jitted executable,
which is exactly how XLA wants it (no data-dependent branching on device).

Sampling uses threefry keys (`jax.random.normal`) instead of torch's global
``randn_like`` (reference vae.py:11-15), making every forward pass
reproducible and vmap-safe.
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
    decoder_c_apply,
    decoder_c_init,
)
from vae_los_angeles_tpu.models.encoders import (
    encoder_a_apply,
    encoder_a_init,
    encoder_b_apply,
    encoder_b_init,
    encoder_c_apply,
    encoder_c_init,
)
from vae_los_angeles_tpu.ops.nn import sigmoid


def reparameterize(key, mu, logvar, noise_scale=None):
    """z = mu + eps * exp(0.5*logvar), eps ~ N(0, I) (reference vae.py:11-15).

    ``noise_scale`` (traced scalar) scales eps: 1.0 is bit-identical to the
    unscaled draw (eps * 1.0 is IEEE-exact, and the expression tree is
    unchanged), 0.0 makes the model DETERMINISTIC (z = mu exactly) — which
    together with a zero KL weight turns a directional VAE into the
    reference's directional AE (same trunk, mu head as the latent
    projection). This is what lets one compiled CV program train both
    families (training/tasks.py *_unified)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    if noise_scale is not None:
        eps = eps * noise_scale
    return mu + eps * std


def fuse_posteriors(mu_list, logvar_list):
    """Arithmetic-mean fusion of per-modality posteriors (vae.py:64-71)."""
    if len(mu_list) == 1:
        return mu_list[0], logvar_list[0]
    return (
        jnp.mean(jnp.stack(mu_list), axis=0),
        jnp.mean(jnp.stack(logvar_list), axis=0),
    )


class MultiModalVAEOutput(NamedTuple):
    out_a: jnp.ndarray  # RNA reconstruction (linear output)
    out_b: jnp.ndarray  # DNA reconstruction, probabilities in [0,1]
    out_b_logits: jnp.ndarray  # pre-sigmoid DNA logits (training path)
    out_c: jnp.ndarray  # site logits
    mu: jnp.ndarray
    logvar: jnp.ndarray
    state: dict  # updated BatchNorm running stats


def multimodal_vae_init(
    key,
    input_dim_a: int,
    input_dim_b: int,
    n_sites: int,
    latent_dim: int,
    embed_dim: int = 32,
):
    keys = jax.random.split(key, 6)
    enc_a_p, enc_a_s = encoder_a_init(keys[0], input_dim_a, latent_dim)
    enc_b_p, enc_b_s = encoder_b_init(keys[1], input_dim_b, latent_dim)
    enc_c_p, _ = encoder_c_init(keys[2], n_sites, latent_dim, embed_dim)
    params = {
        "encoder_a": enc_a_p,
        "encoder_b": enc_b_p,
        "encoder_c": enc_c_p,
        "decoder_a": decoder_a_init(keys[3], latent_dim, input_dim_a),
        "decoder_b": decoder_b_init(keys[4], latent_dim, input_dim_b),
        "decoder_c": decoder_c_init(keys[5], latent_dim, n_sites),
    }
    state = {"encoder_a": enc_a_s, "encoder_b": enc_b_s}
    return params, state


def multimodal_vae_apply(
    params,
    state,
    key,
    a: Optional[jnp.ndarray] = None,
    b: Optional[jnp.ndarray] = None,
    site: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    latent_mask: Optional[jnp.ndarray] = None,
    row_mask: Optional[jnp.ndarray] = None,
) -> MultiModalVAEOutput:
    """Forward over any static subset of (a, b, site) (reference vae.py:37-79).

    ``latent_mask`` (shape ``(latent_dim,)``, 0/1) restricts the model to a
    latent SUB-space: masked dims get mu = logvar = z = 0, so they contribute
    exactly 0 to the KL term (−½·(1+0−0−e⁰) = 0) and 0 to every decoder
    pre-activation, and their encoder/decoder weight slices receive zero
    gradient. This is SURVEY hard-part #4's "pad latent to max and mask"
    option: an HPO population whose trials want DIFFERENT latent_dims can
    share one padded executable, each trial carrying its own mask
    (`evaluation/hpo.py --pad-shapes`). An all-ones mask multiplies by 1.0
    and is bit-identical to the unmasked forward.
    """
    if a is None and b is None and site is None:
        raise ValueError("at least one modality must be provided")
    if key is None:
        key = jax.random.PRNGKey(0)
    k_da, k_db, k_z = jax.random.split(key, 3)

    mu_list, logvar_list = [], []
    new_state = dict(state)
    if a is not None:
        mu_a, lv_a, new_state["encoder_a"] = encoder_a_apply(
            params["encoder_a"], state["encoder_a"], a, train=train, key=k_da,
            row_mask=row_mask,
        )
        mu_list.append(mu_a)
        logvar_list.append(lv_a)
    if b is not None:
        mu_b, lv_b, new_state["encoder_b"] = encoder_b_apply(
            params["encoder_b"], state["encoder_b"], b, train=train, key=k_db,
            row_mask=row_mask,
        )
        mu_list.append(mu_b)
        logvar_list.append(lv_b)
    if site is not None:
        mu_c, lv_c, _ = encoder_c_apply(params["encoder_c"], {}, site)
        mu_list.append(mu_c)
        logvar_list.append(lv_c)

    mu, logvar = fuse_posteriors(mu_list, logvar_list)
    if latent_mask is not None:
        # match the activation dtype: a float32 mask would silently promote
        # bf16 activations (COMPUTE_DTYPE=bfloat16) back to float32 through
        # the fused posterior and all three decoder matmuls
        latent_mask = latent_mask.astype(mu.dtype)
        mu = mu * latent_mask
        logvar = logvar * latent_mask
        z = latent_mask * reparameterize(k_z, mu, logvar)
    else:
        z = reparameterize(k_z, mu, logvar)

    out_a = decoder_a_apply(params["decoder_a"], z)
    out_b_logits = decoder_b_apply_logits(params["decoder_b"], z)
    out_c = decoder_c_apply(params["decoder_c"], z)
    return MultiModalVAEOutput(
        out_a=out_a,
        out_b=sigmoid(out_b_logits),
        out_b_logits=out_b_logits,
        out_c=out_c,
        mu=mu,
        logvar=logvar,
        state=new_state,
    )
