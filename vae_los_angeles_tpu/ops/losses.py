"""Loss functions for all model families, as fused jnp expressions.

Formulas replicate the reference exactly (sum reductions throughout):
  * tri-modal ``vae_loss``: MSE-sum(RNA) + BCE-sum(DNA) + gamma*CE-sum(site,
    optional class weights) + beta*KLD   (reference src/utils/losses.py:8-46)
  * ``rna2dna_loss``: BCE-sum + beta*KLD; ``dna2rna_loss``: MSE-sum + beta*KLD
    (reference src/utils/directional_losses.py:8-53)
  * AE losses: reconstruction term only (reference src/utils/ae_losses.py)
  * KLD = -0.5 * sum(1 + logvar - mu^2 - exp(logvar))

Numerics: the training path evaluates DNA reconstruction as
binary-cross-entropy **from logits** (`bce_with_logits_sum`), which is
algebraically identical to sigmoid→BCE but avoids log(0); gradients match
torch's prob-space BCE exactly (both reduce to sigmoid(l) - t w.r.t. logits).
A prob-space `bce_sum` with torch's log-clamp at -100 is provided for parity
when only probabilities are available (e.g. evaluating a loaded checkpoint
through the public forward that returns probabilities).

Each loss returns (total, aux-dict) rather than torch's ``.item()`` tuples so
the whole thing stays on-device inside ``lax.scan`` — no per-batch host sync
(the reference pays one device→host sync per batch, train_rna2dna.py:99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_rows(term, row_mask):
    """Zero the padded rows of an elementwise loss term BEFORE the sum.

    ``where`` (never multiply) so garbage/NaN padding cannot poison through
    0·inf, and the masking happens at ELEMENT level ahead of the ORIGINAL
    sum expression — an all-ones mask leaves the reduction tree untouched,
    so the masked program is inert when every row is real (the padded-fold
    population contract, parallel/vmap_meta masked mode)."""
    if row_mask is None:
        return term
    mask = row_mask
    while mask.ndim < term.ndim:
        mask = mask[..., None]
    return jnp.where(mask, term, 0.0)


def kl_divergence(mu, logvar, row_mask=None):
    """-0.5 * sum(1 + logvar - mu^2 - e^logvar)  (losses.py:42-44)."""
    term = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * jnp.sum(_mask_rows(term, row_mask))


def mse_sum(pred, target, row_mask=None):
    return jnp.sum(_mask_rows(jnp.square(pred - target), row_mask))


def bce_sum(probs, target, row_mask=None):
    """Prob-space BCE with torch's clamp of log terms at -100."""
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.sum(
        _mask_rows(target * log_p + (1.0 - target) * log_1mp, row_mask)
    )


def bce_with_logits_sum(logits, target, row_mask=None):
    """Numerically-stable BCE from logits: sum(max(l,0) - l*t + log1p(e^-|l|))."""
    term = (
        jnp.maximum(logits, 0.0)
        - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.sum(_mask_rows(term, row_mask))


def cross_entropy_sum(logits, labels, class_weights=None, row_mask=None):
    """``F.cross_entropy(..., weight=w, reduction='sum')`` semantics.

    With class weights torch computes sum_i w[y_i] * nll_i (sum reduction does
    NOT renormalize by sum of weights — that only happens for 'mean').
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        nll = nll * jnp.take(class_weights, labels)
    return jnp.sum(_mask_rows(nll, row_mask))


# ---------------------------------------------------------------------------
# Model-family losses
# ---------------------------------------------------------------------------


def vae_loss(
    recon_a,
    a,
    recon_b_logits,
    b,
    recon_c,
    site,
    mu,
    logvar,
    beta=1e-3,
    gamma=1.0,
    class_weights=None,
    row_mask=None,
):
    """Tri-modal loss (reference losses.py:8). ``recon_b_logits`` are
    pre-sigmoid DNA logits. Any of the three reconstruction terms may be None
    (mirrors the reference's optional-modality accounting).

    Returns (total, {"recon": .., "class": .., "kld": ..}).
    """
    recon = jnp.float32(0.0)
    if recon_a is not None and a is not None:
        recon = recon + mse_sum(recon_a, a, row_mask)
    if recon_b_logits is not None and b is not None:
        recon = recon + bce_with_logits_sum(recon_b_logits, b, row_mask)
    class_loss = jnp.float32(0.0)
    if recon_c is not None and site is not None:
        class_loss = cross_entropy_sum(recon_c, site, class_weights, row_mask)
    kld = kl_divergence(mu, logvar, row_mask)
    total = recon + gamma * class_loss + beta * kld
    return total, {"recon": recon, "class": class_loss, "kld": kld}


def rna2dna_loss(recon_dna_logits, dna, mu, logvar, beta=1e-3, row_mask=None):
    """BCE-sum + beta*KLD (reference directional_losses.py:8-30)."""
    recon = bce_with_logits_sum(recon_dna_logits, dna, row_mask)
    kld = kl_divergence(mu, logvar, row_mask)
    return recon + beta * kld, {"recon": recon, "kld": kld}


def dna2rna_loss(recon_rna, rna, mu, logvar, beta=1e-3, row_mask=None):
    """MSE-sum + beta*KLD (reference directional_losses.py:33-53)."""
    recon = mse_sum(recon_rna, rna, row_mask)
    kld = kl_divergence(mu, logvar, row_mask)
    return recon + beta * kld, {"recon": recon, "kld": kld}


def rna2dna_ae_loss(recon_dna_logits, dna, row_mask=None):
    """BCE-sum only (reference ae_losses.py:8-20)."""
    recon = bce_with_logits_sum(recon_dna_logits, dna, row_mask)
    return recon, {"recon": recon}


def dna2rna_ae_loss(recon_rna, rna, row_mask=None):
    """MSE-sum only (reference ae_losses.py:25-37)."""
    recon = mse_sum(recon_rna, rna, row_mask)
    return recon, {"recon": recon}
