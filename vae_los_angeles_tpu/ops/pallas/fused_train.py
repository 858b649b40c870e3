"""Fully-fused Pallas TRAINING step for RNA2DNAVAE: forward + manual
backward in ONE kernel.

The BASELINE.json north-star's final piece: the whole train-mode pass —
encode (Linear→train-BatchNorm→ReLU→Dropout) → mean-fuse with the site
posterior → reparameterize → decode (L→256→512→dim_b) → BCE+β·KL loss —
AND its complete backward (gradients for every parameter, including
BatchNorm's batch-statistics backprop and the running-stats update) executes
as a single Mosaic kernel. All ~24 matmuls and every intermediate activation
stay in VMEM; HBM sees only params in, grads out.

Noise handling: in production the kernel draws dropout masks and the
reparameterization eps from the in-kernel TPU PRNG; for the equivalence test
both can be supplied as inputs, so the kernel's gradients are compared
bit-for-fp32 against ``jax.grad`` of an XLA reference forward using the SAME
noise (tests/test_pallas_train.py).

Backward math (derived, not autodiff):
  * BCE-with-logits: dlogits = sigmoid(logits) − t
  * KL: dmu += β·mu ; dlogvar += −β/2·(1 − e^logvar)
  * reparameterize z = mu + ε·e^{lv/2}: dmu += dz ; dlv += dz·ε·e^{lv/2}/2
  * train BatchNorm (batch stats μB, σB): dγ = Σ dh·x̂, dβ = Σ dh,
    da = γ/σB · (dx̂ − mean(dx̂) − x̂·mean(dx̂·x̂))   with dx̂ = dh·γ… (folded)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_los_angeles_tpu.ops.nn import BN_EPS, BN_MOMENTUM

DROPOUT_RATE = 0.1

# PRNG/bit-twiddling helpers shared with the inference kernels — single
# source of truth so the noise streams cannot drift between kernel families
from vae_los_angeles_tpu.ops.pallas.fused_vae import (  # noqa: E402
    _box_muller,
    _dot,
    _interpret,
    _uniform_from_bits,
)


def check_noise_args(**named):
    """All injected-noise inputs must be supplied together or not at all.

    A partial set would be SILENTLY ignored (the kernel has one use_prng
    flag covering eps and every dropout mask), so fail loudly instead.
    Returns use_prng (True = no noise supplied, use the in-kernel TPU PRNG).
    """
    missing = [k for k, v in named.items() if v is None]
    if missing and len(missing) != len(named):
        given = sorted(set(named) - set(missing))
        raise ValueError(
            "fused kernels take injected noise all-or-nothing: got "
            f"{given} but not {sorted(missing)} — supply every noise input "
            "(deterministic mode) or none (in-kernel PRNG)"
        )
    return len(missing) == len(named)


def _rand_uniform(shape):
    return _uniform_from_bits(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    )


# Parameter layout (flat name → tree path) shared by wrapper and kernel.
PARAM_ORDER = [
    ("w1", ("encoder_rna", "fc", "w")),
    ("b1", ("encoder_rna", "fc", "b")),
    ("gamma", ("encoder_rna", "bn", "gamma")),
    ("bnbeta", ("encoder_rna", "bn", "beta")),
    ("wmu", ("encoder_rna", "mu", "w")),
    ("bmu", ("encoder_rna", "mu", "b")),
    ("wlv", ("encoder_rna", "logvar", "w")),
    ("blv", ("encoder_rna", "logvar", "b")),
    ("emb", ("encoder_site", "embedding", "table")),
    ("smu_w", ("encoder_site", "mu", "w")),
    ("smu_b", ("encoder_site", "mu", "b")),
    ("slv_w", ("encoder_site", "logvar", "w")),
    ("slv_b", ("encoder_site", "logvar", "b")),
    ("d1w", ("decoder_dna", "fc1", "w")),
    ("d1b", ("decoder_dna", "fc1", "b")),
    ("d2w", ("decoder_dna", "fc2", "w")),
    ("d2b", ("decoder_dna", "fc2", "b")),
    ("d3w", ("decoder_dna", "fc3", "w")),
    ("d3b", ("decoder_dna", "fc3", "b")),
]


def _train_kernel(
    # SMEM scalars
    seed_ref, beta_ref, use_prng_ref,
    # data
    x_ref, t_ref, onehot_ref,
    # params (PARAM_ORDER)
    w1_ref, b1_ref, gamma_ref, bnbeta_ref,
    wmu_ref, bmu_ref, wlv_ref, blv_ref,
    emb_ref, smu_w_ref, smu_b_ref, slv_w_ref, slv_b_ref,
    d1w_ref, d1b_ref, d2w_ref, d2b_ref, d3w_ref, d3b_ref,
    # BN running stats
    rm_ref, rv_ref,
    # externally supplied noise (used when use_prng == 0)
    eps_in_ref, dropmask_in_ref,
    # outputs: loss, grads (PARAM_ORDER), new running stats
    loss_ref,
    g_w1_ref, g_b1_ref, g_gamma_ref, g_bnbeta_ref,
    g_wmu_ref, g_bmu_ref, g_wlv_ref, g_blv_ref,
    g_emb_ref, g_smu_w_ref, g_smu_b_ref, g_slv_w_ref, g_slv_b_ref,
    g_d1w_ref, g_d1b_ref, g_d2w_ref, g_d2b_ref, g_d3w_ref, g_d3b_ref,
    new_rm_ref, new_rv_ref,
):
    pltpu.prng_seed(seed_ref[0])
    beta = beta_ref[0]
    use_prng = (use_prng_ref[0] == 1).astype(jnp.float32)
    x = x_ref[:]
    t = t_ref[:]
    batch = x.shape[0]

    # ---------------- forward ----------------
    a1 = _dot(x, w1_ref[:]) + b1_ref[:]
    mu_b = jnp.mean(a1, axis=0)
    var_b = jnp.mean(jnp.square(a1 - mu_b), axis=0)
    inv_std = jax.lax.rsqrt(var_b + BN_EPS)
    xhat = (a1 - mu_b) * inv_std
    h = xhat * gamma_ref[:] + bnbeta_ref[:]
    relu_mask = (h > 0).astype(jnp.float32)
    r = h * relu_mask
    keep = 1.0 - DROPOUT_RATE
    drop_prng = (_rand_uniform(r.shape) < keep).astype(jnp.float32)
    drop = use_prng * drop_prng + (1.0 - use_prng) * dropmask_in_ref[:]
    d = r * drop / keep

    mu_r = _dot(d, wmu_ref[:]) + bmu_ref[:]
    lv_r = _dot(d, wlv_ref[:]) + blv_ref[:]
    e = _dot(onehot_ref[:], emb_ref[:])
    mu_s = _dot(e, smu_w_ref[:]) + smu_b_ref[:]
    lv_s = _dot(e, slv_w_ref[:]) + slv_b_ref[:]
    mu = 0.5 * (mu_r + mu_s)
    lv = 0.5 * (lv_r + lv_s)

    eps = use_prng * _box_muller(mu.shape) + (1.0 - use_prng) * eps_in_ref[:]
    sigma = jnp.exp(0.5 * lv)
    z = mu + eps * sigma

    u1 = _dot(z, d1w_ref[:]) + d1b_ref[:]
    m1 = (u1 > 0).astype(jnp.float32)
    r1 = u1 * m1
    u2 = _dot(r1, d2w_ref[:]) + d2b_ref[:]
    m2 = (u2 > 0).astype(jnp.float32)
    r2 = u2 * m2
    logits = _dot(r2, d3w_ref[:]) + d3b_ref[:]

    bce = jnp.sum(
        jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    kld = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    loss_ref[0, 0] = bce + beta * kld

    # BN running-stats update (unbiased var, torch momentum semantics)
    unbias = batch / max(batch - 1, 1)
    new_rm_ref[:] = (1.0 - BN_MOMENTUM) * rm_ref[:] + BN_MOMENTUM * mu_b
    new_rv_ref[:] = (1.0 - BN_MOMENTUM) * rv_ref[:] + BN_MOMENTUM * var_b * unbias

    # ---------------- backward ----------------
    dlogits = jax.nn.sigmoid(logits) - t
    g_d3w_ref[:] = _dot(r2.T, dlogits)
    g_d3b_ref[:] = jnp.sum(dlogits, axis=0)
    dr2 = _dot(dlogits, d3w_ref[:].T)
    du2 = dr2 * m2
    g_d2w_ref[:] = _dot(r1.T, du2)
    g_d2b_ref[:] = jnp.sum(du2, axis=0)
    dr1 = _dot(du2, d2w_ref[:].T)
    du1 = dr1 * m1
    g_d1w_ref[:] = _dot(z.T, du1)
    g_d1b_ref[:] = jnp.sum(du1, axis=0)
    dz = _dot(du1, d1w_ref[:].T)

    dmu = dz + beta * mu
    dlv = dz * eps * 0.5 * sigma + (-0.5 * beta) * (1.0 - jnp.exp(lv))

    dmu_half = 0.5 * dmu
    dlv_half = 0.5 * dlv
    g_wmu_ref[:] = _dot(d.T, dmu_half)
    g_bmu_ref[:] = jnp.sum(dmu_half, axis=0)
    g_wlv_ref[:] = _dot(d.T, dlv_half)
    g_blv_ref[:] = jnp.sum(dlv_half, axis=0)

    g_smu_w_ref[:] = _dot(e.T, dmu_half)
    g_smu_b_ref[:] = jnp.sum(dmu_half, axis=0)
    g_slv_w_ref[:] = _dot(e.T, dlv_half)
    g_slv_b_ref[:] = jnp.sum(dlv_half, axis=0)
    de = _dot(dmu_half, smu_w_ref[:].T) + _dot(dlv_half, slv_w_ref[:].T)
    g_emb_ref[:] = _dot(onehot_ref[:].T, de)

    dd = _dot(dmu_half, wmu_ref[:].T) + _dot(dlv_half, wlv_ref[:].T)
    dr = dd * drop / keep
    dh = dr * relu_mask
    g_gamma_ref[:] = jnp.sum(dh * xhat, axis=0)
    g_bnbeta_ref[:] = jnp.sum(dh, axis=0)
    dxhat = dh * gamma_ref[:]
    da1 = inv_std * (
        dxhat
        - jnp.mean(dxhat, axis=0)
        - xhat * jnp.mean(dxhat * xhat, axis=0)
    )
    g_w1_ref[:] = _dot(x.T, da1)
    g_b1_ref[:] = jnp.sum(da1, axis=0)


@functools.partial(jax.jit, static_argnames=("use_prng",))
def _train_step_call(flat_params, rm, rv, x, t, onehot, seed, beta, eps_in,
                     dropmask_in, use_prng: bool):
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_params = len(PARAM_ORDER)
    out_shape = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct(flat_params[k].shape, jnp.float32) for k, _ in PARAM_ORDER]
        + [jax.ShapeDtypeStruct(rm.shape, jnp.float32),
           jax.ShapeDtypeStruct(rv.shape, jnp.float32)]
    )
    out_specs = tuple(
        [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * (n_params + 2)
    )
    outs = pl.pallas_call(
        _train_kernel,
        out_shape=tuple(out_shape),
        in_specs=[smem(), smem(), smem(), vmem(), vmem(), vmem()]
        + [vmem()] * n_params
        + [vmem(), vmem(), vmem(), vmem()],
        out_specs=out_specs,
        interpret=_interpret(),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([1 if use_prng else 0], jnp.int32),
        x, t, onehot,
        *[flat_params[k] for k, _ in PARAM_ORDER],
        rm, rv, eps_in, dropmask_in,
    )
    loss = outs[0][0, 0]
    grads = {k: outs[1 + i] for i, (k, _) in enumerate(PARAM_ORDER)}
    new_rm, new_rv = outs[-2], outs[-1]
    return loss, grads, new_rm, new_rv


def _flatten_params(params):
    return _flatten_by(params, PARAM_ORDER)


def _unflatten_grads(grads_flat):
    return _unflatten_by(grads_flat, PARAM_ORDER)


# ---------------------------------------------------------------------------
# DNA → RNA fused train step (EncoderB: two BN/ReLU/Dropout blocks; DecoderA:
# linear head; MSE-sum + β·KL loss)
# ---------------------------------------------------------------------------

PARAM_ORDER_D2R = [
    ("w1", ("encoder_dna", "fc1", "w")),
    ("b1", ("encoder_dna", "fc1", "b")),
    ("gamma1", ("encoder_dna", "bn1", "gamma")),
    ("beta1", ("encoder_dna", "bn1", "beta")),
    ("w2", ("encoder_dna", "fc2", "w")),
    ("b2", ("encoder_dna", "fc2", "b")),
    ("gamma2", ("encoder_dna", "bn2", "gamma")),
    ("beta2", ("encoder_dna", "bn2", "beta")),
    ("wmu", ("encoder_dna", "mu", "w")),
    ("bmu", ("encoder_dna", "mu", "b")),
    ("wlv", ("encoder_dna", "logvar", "w")),
    ("blv", ("encoder_dna", "logvar", "b")),
    ("emb", ("encoder_site", "embedding", "table")),
    ("smu_w", ("encoder_site", "mu", "w")),
    ("smu_b", ("encoder_site", "mu", "b")),
    ("slv_w", ("encoder_site", "logvar", "w")),
    ("slv_b", ("encoder_site", "logvar", "b")),
    ("d1w", ("decoder_rna", "fc1", "w")),
    ("d1b", ("decoder_rna", "fc1", "b")),
    ("d2w", ("decoder_rna", "fc2", "w")),
    ("d2b", ("decoder_rna", "fc2", "b")),
]


def _bn_train_fwd(a, gamma, bnbeta):
    mu_b = jnp.mean(a, axis=0)
    var_b = jnp.mean(jnp.square(a - mu_b), axis=0)
    inv_std = jax.lax.rsqrt(var_b + BN_EPS)
    xhat = (a - mu_b) * inv_std
    return xhat * gamma + bnbeta, xhat, inv_std, mu_b, var_b


def _bn_train_bwd(dh, xhat, inv_std, gamma):
    dgamma = jnp.sum(dh * xhat, axis=0)
    dbeta = jnp.sum(dh, axis=0)
    dxhat = dh * gamma
    da = inv_std * (
        dxhat - jnp.mean(dxhat, axis=0) - xhat * jnp.mean(dxhat * xhat, axis=0)
    )
    return da, dgamma, dbeta


def _d2r_train_kernel(
    seed_ref, beta_ref, use_prng_ref,
    x_ref, t_ref, onehot_ref,
    w1_ref, b1_ref, gamma1_ref, beta1_ref,
    w2_ref, b2_ref, gamma2_ref, beta2_ref,
    wmu_ref, bmu_ref, wlv_ref, blv_ref,
    emb_ref, smu_w_ref, smu_b_ref, slv_w_ref, slv_b_ref,
    d1w_ref, d1b_ref, d2w_ref, d2b_ref,
    rm1_ref, rv1_ref, rm2_ref, rv2_ref,
    eps_in_ref, drop1_in_ref, drop2_in_ref,
    loss_ref,
    g_w1_ref, g_b1_ref, g_gamma1_ref, g_beta1_ref,
    g_w2_ref, g_b2_ref, g_gamma2_ref, g_beta2_ref,
    g_wmu_ref, g_bmu_ref, g_wlv_ref, g_blv_ref,
    g_emb_ref, g_smu_w_ref, g_smu_b_ref, g_slv_w_ref, g_slv_b_ref,
    g_d1w_ref, g_d1b_ref, g_d2w_ref, g_d2b_ref,
    new_rm1_ref, new_rv1_ref, new_rm2_ref, new_rv2_ref,
):
    pltpu.prng_seed(seed_ref[0])
    beta = beta_ref[0]
    use_prng = (use_prng_ref[0] == 1).astype(jnp.float32)
    x = x_ref[:]
    t = t_ref[:]
    batch = x.shape[0]
    keep = 1.0 - DROPOUT_RATE

    # ---- forward: block 1 ----
    a1 = _dot(x, w1_ref[:]) + b1_ref[:]
    h1, xhat1, inv_std1, mu_b1, var_b1 = _bn_train_fwd(a1, gamma1_ref[:], beta1_ref[:])
    rmask1 = (h1 > 0).astype(jnp.float32)
    r1e = h1 * rmask1
    drop1 = use_prng * (_rand_uniform(r1e.shape) < keep).astype(jnp.float32) + (
        1.0 - use_prng
    ) * drop1_in_ref[:]
    d1 = r1e * drop1 / keep
    # ---- block 2 ----
    a2 = _dot(d1, w2_ref[:]) + b2_ref[:]
    h2, xhat2, inv_std2, mu_b2, var_b2 = _bn_train_fwd(a2, gamma2_ref[:], beta2_ref[:])
    rmask2 = (h2 > 0).astype(jnp.float32)
    r2e = h2 * rmask2
    drop2 = use_prng * (_rand_uniform(r2e.shape) < keep).astype(jnp.float32) + (
        1.0 - use_prng
    ) * drop2_in_ref[:]
    d2 = r2e * drop2 / keep

    mu_r = _dot(d2, wmu_ref[:]) + bmu_ref[:]
    lv_r = _dot(d2, wlv_ref[:]) + blv_ref[:]
    e = _dot(onehot_ref[:], emb_ref[:])
    mu_s = _dot(e, smu_w_ref[:]) + smu_b_ref[:]
    lv_s = _dot(e, slv_w_ref[:]) + slv_b_ref[:]
    mu = 0.5 * (mu_r + mu_s)
    lv = 0.5 * (lv_r + lv_s)

    eps = use_prng * _box_muller(mu.shape) + (1.0 - use_prng) * eps_in_ref[:]
    sigma = jnp.exp(0.5 * lv)
    z = mu + eps * sigma

    u1 = _dot(z, d1w_ref[:]) + d1b_ref[:]
    m1 = (u1 > 0).astype(jnp.float32)
    rd1 = u1 * m1
    recon = _dot(rd1, d2w_ref[:]) + d2b_ref[:]

    diff = recon - t
    mse = jnp.sum(diff * diff)
    kld = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    loss_ref[0, 0] = mse + beta * kld

    unbias = batch / max(batch - 1, 1)
    new_rm1_ref[:] = (1.0 - BN_MOMENTUM) * rm1_ref[:] + BN_MOMENTUM * mu_b1
    new_rv1_ref[:] = (1.0 - BN_MOMENTUM) * rv1_ref[:] + BN_MOMENTUM * var_b1 * unbias
    new_rm2_ref[:] = (1.0 - BN_MOMENTUM) * rm2_ref[:] + BN_MOMENTUM * mu_b2
    new_rv2_ref[:] = (1.0 - BN_MOMENTUM) * rv2_ref[:] + BN_MOMENTUM * var_b2 * unbias

    # ---- backward ----
    drecon = 2.0 * diff
    g_d2w_ref[:] = _dot(rd1.T, drecon)
    g_d2b_ref[:] = jnp.sum(drecon, axis=0)
    drd1 = _dot(drecon, d2w_ref[:].T)
    du1 = drd1 * m1
    g_d1w_ref[:] = _dot(z.T, du1)
    g_d1b_ref[:] = jnp.sum(du1, axis=0)
    dz = _dot(du1, d1w_ref[:].T)

    dmu = dz + beta * mu
    dlv = dz * eps * 0.5 * sigma + (-0.5 * beta) * (1.0 - jnp.exp(lv))
    dmu_half = 0.5 * dmu
    dlv_half = 0.5 * dlv

    g_wmu_ref[:] = _dot(d2.T, dmu_half)
    g_bmu_ref[:] = jnp.sum(dmu_half, axis=0)
    g_wlv_ref[:] = _dot(d2.T, dlv_half)
    g_blv_ref[:] = jnp.sum(dlv_half, axis=0)
    g_smu_w_ref[:] = _dot(e.T, dmu_half)
    g_smu_b_ref[:] = jnp.sum(dmu_half, axis=0)
    g_slv_w_ref[:] = _dot(e.T, dlv_half)
    g_slv_b_ref[:] = jnp.sum(dlv_half, axis=0)
    de = _dot(dmu_half, smu_w_ref[:].T) + _dot(dlv_half, slv_w_ref[:].T)
    g_emb_ref[:] = _dot(onehot_ref[:].T, de)

    dd2 = _dot(dmu_half, wmu_ref[:].T) + _dot(dlv_half, wlv_ref[:].T)
    dr2e = dd2 * drop2 / keep
    dh2 = dr2e * rmask2
    da2, dgamma2, dbeta2 = _bn_train_bwd(dh2, xhat2, inv_std2, gamma2_ref[:])
    g_gamma2_ref[:] = dgamma2
    g_beta2_ref[:] = dbeta2
    g_w2_ref[:] = _dot(d1.T, da2)
    g_b2_ref[:] = jnp.sum(da2, axis=0)
    dd1 = _dot(da2, w2_ref[:].T)

    dr1e = dd1 * drop1 / keep
    dh1 = dr1e * rmask1
    da1, dgamma1, dbeta1 = _bn_train_bwd(dh1, xhat1, inv_std1, gamma1_ref[:])
    g_gamma1_ref[:] = dgamma1
    g_beta1_ref[:] = dbeta1
    g_w1_ref[:] = _dot(x.T, da1)
    g_b1_ref[:] = jnp.sum(da1, axis=0)


@functools.partial(jax.jit, static_argnames=("use_prng",))
def _d2r_train_step_call(flat_params, rm1, rv1, rm2, rv2, x, t, onehot, seed,
                         beta, eps_in, drop1_in, drop2_in, use_prng: bool):
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_params = len(PARAM_ORDER_D2R)
    out_shape = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        + [
            jax.ShapeDtypeStruct(flat_params[k].shape, jnp.float32)
            for k, _ in PARAM_ORDER_D2R
        ]
        + [
            jax.ShapeDtypeStruct(rm1.shape, jnp.float32),
            jax.ShapeDtypeStruct(rv1.shape, jnp.float32),
            jax.ShapeDtypeStruct(rm2.shape, jnp.float32),
            jax.ShapeDtypeStruct(rv2.shape, jnp.float32),
        ]
    )
    out_specs = tuple(
        [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * (n_params + 4)
    )
    outs = pl.pallas_call(
        _d2r_train_kernel,
        out_shape=tuple(out_shape),
        in_specs=[smem(), smem(), smem(), vmem(), vmem(), vmem()]
        + [vmem()] * n_params
        + [vmem()] * 7,
        out_specs=out_specs,
        interpret=_interpret(),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([1 if use_prng else 0], jnp.int32),
        x, t, onehot,
        *[flat_params[k] for k, _ in PARAM_ORDER_D2R],
        rm1, rv1, rm2, rv2, eps_in, drop1_in, drop2_in,
    )
    loss = outs[0][0, 0]
    grads = {k: outs[1 + i] for i, (k, _) in enumerate(PARAM_ORDER_D2R)}
    return loss, grads, outs[-4], outs[-3], outs[-2], outs[-1]


def _flatten_by(params, order):
    flat = {}
    for name, path in order:
        node = params
        for p in path[:-1]:
            node = node[p]
        flat[name] = node[path[-1]]
    return flat


def _unflatten_by(grads_flat, order):
    tree = {}
    for name, path in order:
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = grads_flat[name]
    return tree


def dna2rna_fused_train_step(
    params, state, rna, dna, site, n_sites, *, seed=0, beta=1e-3,
    eps=None, drop_mask1=None, drop_mask2=None,
):
    """One fused DNA→RNA train step: (loss, grads_pytree, new_state)."""
    flat = _flatten_by(params, PARAM_ORDER_D2R)
    onehot = jax.nn.one_hot(jnp.asarray(site), n_sites, dtype=jnp.float32)
    use_prng = check_noise_args(
        eps=eps, drop_mask1=drop_mask1, drop_mask2=drop_mask2
    )
    batch = dna.shape[0]
    latent = flat["wmu"].shape[1]
    if eps is None:
        eps = jnp.zeros((batch, latent), jnp.float32)
    if drop_mask1 is None:
        drop_mask1 = jnp.ones((batch, flat["w1"].shape[1]), jnp.float32)
    if drop_mask2 is None:
        drop_mask2 = jnp.ones((batch, flat["w2"].shape[1]), jnp.float32)
    bn = state["encoder_dna"]
    loss, grads_flat, rm1, rv1, rm2, rv2 = _d2r_train_step_call(
        flat,
        bn["bn1"]["mean"], bn["bn1"]["var"], bn["bn2"]["mean"], bn["bn2"]["var"],
        jnp.asarray(dna, jnp.float32),
        jnp.asarray(rna, jnp.float32),
        onehot, seed, beta,
        jnp.asarray(eps, jnp.float32),
        jnp.asarray(drop_mask1, jnp.float32),
        jnp.asarray(drop_mask2, jnp.float32),
        use_prng,
    )
    grads = _unflatten_by(grads_flat, PARAM_ORDER_D2R)
    new_state = {
        "encoder_dna": {
            "bn1": {"mean": rm1, "var": rv1},
            "bn2": {"mean": rm2, "var": rv2},
        }
    }
    return loss, grads, new_state


def rna2dna_fused_train_step(
    params, state, rna, dna, site, n_sites, *, seed=0, beta=1e-3,
    eps=None, drop_mask=None,
):
    """One fused train step: returns (loss, grads_pytree, new_state).

    When ``eps``/``drop_mask`` are supplied the kernel uses them instead of
    its internal PRNG (deterministic mode for equivalence testing).
    """
    flat = _flatten_params(params)
    onehot = jax.nn.one_hot(jnp.asarray(site), n_sites, dtype=jnp.float32)
    use_prng = check_noise_args(eps=eps, drop_mask=drop_mask)
    batch = rna.shape[0]
    latent = flat["wmu"].shape[1]
    if eps is None:
        eps = jnp.zeros((batch, latent), jnp.float32)
    if drop_mask is None:
        drop_mask = jnp.ones((batch, flat["w1"].shape[1]), jnp.float32)
    loss, grads_flat, new_rm, new_rv = _train_step_call(
        flat,
        state["encoder_rna"]["bn"]["mean"],
        state["encoder_rna"]["bn"]["var"],
        jnp.asarray(rna, jnp.float32),
        jnp.asarray(dna, jnp.float32),
        onehot,
        seed,
        beta,
        jnp.asarray(eps, jnp.float32),
        jnp.asarray(drop_mask, jnp.float32),
        use_prng,
    )
    grads = _unflatten_grads(grads_flat)
    new_state = {"encoder_rna": {"bn": {"mean": new_rm, "var": new_rv}}}
    return loss, grads, new_state
