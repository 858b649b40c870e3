"""Fused directional-VAE loss with a hand-written backward (custom VJP).

SURVEY §7 build-plan item 5: "a fused loss+backward kernel; fall back to
XLA-compiled jax.grad for correctness parity, keep Pallas behind a flag with
an equivalence test."

`rna2dna_loss_fused(logits, dna, mu, logvar, beta)` computes
BCE-with-logits-sum + β·KLD in ONE Pallas kernel (single pass over the
(B, dim_b) logits — the sigmoid, both log-terms and the KL reduction fuse
into one VPU sweep), and its backward is a second Pallas kernel emitting all
three gradients analytically:

    dL/dlogits = (sigmoid(logits) - dna) · ĝ
    dL/dmu     = β·mu · ĝ
    dL/dlogvar = -β/2·(1 - e^logvar) · ĝ

(ĝ = upstream cotangent.) The closed-form backward is the whole point: the
autodiff path materializes sigmoid/log intermediates for the residual chain,
while this VJP recomputes nothing and stores nothing but the primal inputs.

Equality with `ops.losses.rna2dna_loss` (value AND gradients) is asserted in
tests/test_pallas.py; the kernels run under the TPU interpreter off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def _loss_kernel(beta_ref, logits_ref, dna_ref, mu_ref, logvar_ref, out_ref,
                 kld_ref):
    logits = logits_ref[:]
    dna = dna_ref[:]
    # BCE with logits: max(l,0) - l*t + log1p(exp(-|l|))
    bce = jnp.sum(
        jnp.maximum(logits, 0.0)
        - logits * dna
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    mu = mu_ref[:]
    logvar = logvar_ref[:]
    kld = -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar))
    kld_ref[0, 0] = kld  # residual: dL/dβ = KLD (β is differentiable)
    out_ref[0, 0] = bce + beta_ref[0] * kld


def _grad_kernel(beta_ref, g_ref, logits_ref, dna_ref, mu_ref, logvar_ref,
                 dlogits_ref, dmu_ref, dlogvar_ref):
    g = g_ref[0]
    beta = beta_ref[0]
    dlogits_ref[:] = (jax.nn.sigmoid(logits_ref[:]) - dna_ref[:]) * g
    dmu_ref[:] = beta * mu_ref[:] * g
    dlogvar_ref[:] = -0.5 * beta * (1.0 - jnp.exp(logvar_ref[:])) * g


def _smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@jax.jit
def _loss_fwd_call(logits, dna, mu, logvar, beta):
    out, kld = pl.pallas_call(
        _loss_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[_smem(), _vmem(), _vmem(), _vmem(), _vmem()],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_interpret(),
    )(jnp.asarray([beta], jnp.float32), logits, dna, mu, logvar)
    return out[0, 0], kld[0, 0]


@jax.jit
def _loss_bwd_call(logits, dna, mu, logvar, beta, g):
    return pl.pallas_call(
        _grad_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(logits.shape, jnp.float32),
            jax.ShapeDtypeStruct(mu.shape, jnp.float32),
            jax.ShapeDtypeStruct(logvar.shape, jnp.float32),
        ),
        in_specs=[_smem(), _smem(), _vmem(), _vmem(), _vmem(), _vmem()],
        out_specs=(_vmem(), _vmem(), _vmem()),
        interpret=_interpret(),
    )(
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([g], jnp.float32),
        logits,
        dna,
        mu,
        logvar,
    )


@jax.custom_vjp
def rna2dna_loss_fused(logits, dna, mu, logvar, beta=1e-3):
    """BCE-with-logits-sum + β·KLD as one fused kernel with analytic VJP.

    β is a DIFFERENTIABLE argument (dL/dβ = KLD, saved as a kernel residual)
    so the traced per-epoch warmup β the training engine produces flows
    through jax.grad — a nondiff_argnums β would raise on the first traced
    value and make the kernel unusable inside lax.scan training loops."""
    loss, _ = _loss_fwd_call(logits, dna, mu, logvar, beta)
    return loss


def _fwd(logits, dna, mu, logvar, beta):
    loss, kld = _loss_fwd_call(logits, dna, mu, logvar, beta)
    return loss, (logits, dna, mu, logvar, beta, kld)


def _bwd(residuals, g):
    logits, dna, mu, logvar, beta, kld = residuals
    dlogits, dmu, dlogvar = _loss_bwd_call(logits, dna, mu, logvar, beta, g)
    return dlogits, jnp.zeros_like(dna), dmu, dlogvar, kld * g


rna2dna_loss_fused.defvjp(_fwd, _bwd)
