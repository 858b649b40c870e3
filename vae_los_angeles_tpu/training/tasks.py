"""Task registry: binds each model family to its init / loss / predict fns.

A Task packages everything the fused training engine needs, with a uniform
batch convention — every batch is the (tpm, beta, site) triple from
`data.dataset.MultiModalArrays`; the task decides which fields are inputs
vs target. This mirrors how the reference's five training paths differ only
in the forward call + loss (train_rna2dna.py:86-92, train_dna2rna.py:86-92,
optimize_hyperparameters.py:105-110, vae_cross_modality_cv.py:145-155/234-244).
"""

from __future__ import annotations

from typing import Callable, NamedTuple


from vae_los_angeles_tpu.models import directional_ae, directional_vae, vae
from vae_los_angeles_tpu.ops import losses


class Task(NamedTuple):
    name: str
    # init(key, cfg, n_sites) -> (params, bn_state)
    init: Callable
    # loss(params, state, key, batch, beta_kl, gamma, class_weights, train,
    #      row_mask=None) -> (loss_sum, new_state); row_mask (n,) bool masks
    #      padded rows out of the sum-losses and BN batch statistics (the
    #      masked fold-population mode, parallel/vmap_meta)
    loss: Callable
    # predict(params, state, key, batch) -> imputed target array (eval mode)
    predict: Callable
    # target(batch) -> ground-truth array for the prediction
    target: Callable
    uses_kl_warmup: bool


def _rna2dna_init(key, cfg, n_sites):
    return directional_vae.rna2dna_vae_init(
        key, cfg.input_dim_a, cfg.input_dim_b, n_sites, cfg.latent_dim, cfg.embed_dim
    )


def _rna2dna_loss(params, state, key, batch, beta_kl, gamma, class_weights, train,
                  row_mask=None):
    out = directional_vae.rna2dna_vae_apply(
        params, state, key, rna=batch.tpm, site=batch.site, train=train,
        row_mask=row_mask,
    )
    total, _ = losses.rna2dna_loss(
        out.recon_logits, batch.beta, out.mu, out.logvar, beta=beta_kl,
        row_mask=row_mask,
    )
    return total, out.state


def _rna2dna_predict(params, state, key, batch):
    return directional_vae.rna2dna_vae_apply(
        params, state, key, rna=batch.tpm, site=batch.site, train=False
    ).recon


def _dna2rna_init(key, cfg, n_sites):
    return directional_vae.dna2rna_vae_init(
        key, cfg.input_dim_a, cfg.input_dim_b, n_sites, cfg.latent_dim, cfg.embed_dim
    )


def _dna2rna_loss(params, state, key, batch, beta_kl, gamma, class_weights, train,
                  row_mask=None):
    out = directional_vae.dna2rna_vae_apply(
        params, state, key, dna=batch.beta, site=batch.site, train=train,
        row_mask=row_mask,
    )
    total, _ = losses.dna2rna_loss(
        out.recon, batch.tpm, out.mu, out.logvar, beta=beta_kl,
        row_mask=row_mask,
    )
    return total, out.state


def _dna2rna_predict(params, state, key, batch):
    return directional_vae.dna2rna_vae_apply(
        params, state, key, dna=batch.beta, site=batch.site, train=False
    ).recon


def _rna2dna_ae_init(key, cfg, n_sites):
    return directional_ae.rna2dna_ae_init(
        key, cfg.input_dim_a, cfg.input_dim_b, n_sites, cfg.latent_dim, cfg.embed_dim
    )


def _rna2dna_ae_loss(params, state, key, batch, beta_kl, gamma, class_weights, train,
                     row_mask=None):
    out = directional_ae.rna2dna_ae_apply(
        params, state, key, rna=batch.tpm, site=batch.site, train=train,
        row_mask=row_mask,
    )
    total, _ = losses.rna2dna_ae_loss(out.recon_logits, batch.beta,
                                      row_mask=row_mask)
    return total, out.state


def _rna2dna_ae_predict(params, state, key, batch):
    return directional_ae.rna2dna_ae_apply(
        params, state, key, rna=batch.tpm, site=batch.site, train=False
    ).recon


def _dna2rna_ae_init(key, cfg, n_sites):
    return directional_ae.dna2rna_ae_init(
        key, cfg.input_dim_a, cfg.input_dim_b, n_sites, cfg.latent_dim, cfg.embed_dim
    )


def _dna2rna_ae_loss(params, state, key, batch, beta_kl, gamma, class_weights, train,
                     row_mask=None):
    out = directional_ae.dna2rna_ae_apply(
        params, state, key, dna=batch.beta, site=batch.site, train=train,
        row_mask=row_mask,
    )
    total, _ = losses.dna2rna_ae_loss(out.recon, batch.tpm,
                                      row_mask=row_mask)
    return total, out.state


def _dna2rna_ae_predict(params, state, key, batch):
    return directional_ae.dna2rna_ae_apply(
        params, state, key, dna=batch.beta, site=batch.site, train=False
    ).recon


def _multimodal_init(key, cfg, n_sites):
    return vae.multimodal_vae_init(
        key, cfg.input_dim_a, cfg.input_dim_b, n_sites, cfg.latent_dim, cfg.embed_dim
    )


def _multimodal_loss(params, state, key, batch, beta_kl, gamma, class_weights, train,
                     row_mask=None):
    out = vae.multimodal_vae_apply(
        params, state, key, a=batch.tpm, b=batch.beta, site=batch.site,
        train=train, row_mask=row_mask,
    )
    total, _ = losses.vae_loss(
        out.out_a,
        batch.tpm,
        out.out_b_logits,
        batch.beta,
        out.out_c,
        batch.site,
        out.mu,
        out.logvar,
        beta=beta_kl,
        gamma=gamma,
        class_weights=class_weights,
        row_mask=row_mask,
    )
    return total, out.state


def _multimodal_predict(params, state, key, batch):
    """Cross-modal imputation of DNA from RNA alone (downstream_task.py:32)."""
    return vae.multimodal_vae_apply(params, state, key, a=batch.tpm, train=False).out_b


def _multimodal_padded_init(key, cfg, n_sites):
    """Tri-modal init at a PADDED latent width, with the live-dims mask in
    the state pytree (all-ones here; `evaluation/hpo.py --pad-shapes`
    overwrites it per trial). Riding in ``state`` means the mask threads
    through the fused engine, vmapped populations, rung-pruned carry slices
    and checkpoints without any engine-signature change."""
    import jax.numpy as jnp

    params, state = vae.multimodal_vae_init(
        key, cfg.input_dim_a, cfg.input_dim_b, n_sites, cfg.latent_dim, cfg.embed_dim
    )
    state = dict(state)
    state["latent_mask"] = jnp.ones((cfg.latent_dim,), jnp.float32)
    return params, state


def _multimodal_padded_loss(params, state, key, batch, beta_kl, gamma,
                            class_weights, train, row_mask=None):
    out = vae.multimodal_vae_apply(
        params, state, key, a=batch.tpm, b=batch.beta, site=batch.site,
        train=train, latent_mask=state["latent_mask"], row_mask=row_mask,
    )
    total, _ = losses.vae_loss(
        out.out_a,
        batch.tpm,
        out.out_b_logits,
        batch.beta,
        out.out_c,
        batch.site,
        out.mu,
        out.logvar,
        beta=beta_kl,
        gamma=gamma,
        class_weights=class_weights,
        row_mask=row_mask,
    )
    # multimodal_vae_apply copies every state key, so out.state keeps the mask
    return total, out.state


def _multimodal_padded_predict(params, state, key, batch):
    return vae.multimodal_vae_apply(
        params, state, key, a=batch.tpm, train=False,
        latent_mask=state["latent_mask"],
    ).out_b


def _unified_init(vae_init):
    """Directional-VAE init plus a ``kl_on`` scalar in the state pytree.

    ``kl_on`` selects the family PER POPULATION MEMBER under vmap: 1.0 keeps
    the exact VAE semantics (eps·1.0 and β·1.0 are IEEE-exact, so a kl_on=1
    member trains bit-identically to the plain VAE task), 0.0 makes the
    model deterministic (z = mu) with a zero KL weight — mathematically the
    reference's directional AE: identical trunk, the mu head as the AE's
    latent projection, mean latent fusion (mean of mus ≡ mean of latents
    when z = mu), identical sum-reduced recon loss. The logvar heads receive
    exactly zero gradient there (loss is independent of them). Riding in
    state, kl_on threads through the fused engine and vmapped fold
    populations without engine changes — the same pattern as
    multimodal_padded's latent_mask. This is what collapses the CV
    harness's per-direction (vae, ae) program PAIR into ONE compiled
    population (evaluation/cross_modality_cv.py --unified-families;
    reference vae_cross_modality_cv.py:198-283 trains them as separate
    sequential loops)."""

    def init(key, cfg, n_sites):
        import jax.numpy as jnp

        params, state = vae_init(key, cfg, n_sites)
        state = dict(state)
        state["kl_on"] = jnp.float32(1.0)
        return params, state

    return init


def _rna2dna_unified_loss(params, state, key, batch, beta_kl, gamma,
                          class_weights, train, row_mask=None):
    kl_on = state["kl_on"]
    out = directional_vae.rna2dna_vae_apply(
        params, state, key, rna=batch.tpm, site=batch.site, train=train,
        noise_scale=kl_on, row_mask=row_mask,
    )
    total, _ = losses.rna2dna_loss(
        out.recon_logits, batch.beta, out.mu, out.logvar,
        beta=beta_kl * kl_on, row_mask=row_mask,
    )
    # rna2dna_vae_apply copies every state key, so out.state keeps kl_on
    return total, out.state


def _rna2dna_unified_predict(params, state, key, batch):
    return directional_vae.rna2dna_vae_apply(
        params, state, key, rna=batch.tpm, site=batch.site, train=False,
        noise_scale=state["kl_on"],
    ).recon


def _dna2rna_unified_loss(params, state, key, batch, beta_kl, gamma,
                          class_weights, train, row_mask=None):
    kl_on = state["kl_on"]
    out = directional_vae.dna2rna_vae_apply(
        params, state, key, dna=batch.beta, site=batch.site, train=train,
        noise_scale=kl_on, row_mask=row_mask,
    )
    total, _ = losses.dna2rna_loss(
        out.recon, batch.tpm, out.mu, out.logvar, beta=beta_kl * kl_on,
        row_mask=row_mask,
    )
    return total, out.state


def _dna2rna_unified_predict(params, state, key, batch):
    return directional_vae.dna2rna_vae_apply(
        params, state, key, dna=batch.beta, site=batch.site, train=False,
        noise_scale=state["kl_on"],
    ).recon


TASKS = {
    "rna2dna": Task(
        "rna2dna",
        _rna2dna_init,
        _rna2dna_loss,
        _rna2dna_predict,
        lambda b: b.beta,
        True,
    ),
    "dna2rna": Task(
        "dna2rna",
        _dna2rna_init,
        _dna2rna_loss,
        _dna2rna_predict,
        lambda b: b.tpm,
        True,
    ),
    "rna2dna_ae": Task(
        "rna2dna_ae",
        _rna2dna_ae_init,
        _rna2dna_ae_loss,
        _rna2dna_ae_predict,
        lambda b: b.beta,
        False,
    ),
    "dna2rna_ae": Task(
        "dna2rna_ae",
        _dna2rna_ae_init,
        _dna2rna_ae_loss,
        _dna2rna_ae_predict,
        lambda b: b.tpm,
        False,
    ),
    "multimodal": Task(
        "multimodal",
        _multimodal_init,
        _multimodal_loss,
        _multimodal_predict,
        lambda b: b.beta,
        True,
    ),
    # family-unified directional tasks: one program trains VAE and AE fold
    # populations together, selected per member by state["kl_on"] — see
    # _unified_init for the exact-equivalence argument
    "rna2dna_unified": Task(
        "rna2dna_unified",
        _unified_init(_rna2dna_init),
        _rna2dna_unified_loss,
        _rna2dna_unified_predict,
        lambda b: b.beta,
        True,
    ),
    "dna2rna_unified": Task(
        "dna2rna_unified",
        _unified_init(_dna2rna_init),
        _dna2rna_unified_loss,
        _dna2rna_unified_predict,
        lambda b: b.tpm,
        True,
    ),
    # padded-latent variant for shape-heterogeneous HPO populations
    # (SURVEY hard-part #4 "pad latent to max and mask"); the per-model
    # latent mask lives in the state pytree — see _multimodal_padded_init
    "multimodal_padded": Task(
        "multimodal_padded",
        _multimodal_padded_init,
        _multimodal_padded_loss,
        _multimodal_padded_predict,
        lambda b: b.beta,
        True,
    ),
}
