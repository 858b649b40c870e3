"""Whole-EPOCH megakernel for the tri-modal MultiModalVAE: every AdamW step
of an epoch runs inside ONE Pallas kernel with all 39 parameter tensors AND
their AdamW moments VMEM-resident.

Same design as the directional megakernels (`fused_epoch.py`): the grid
iterates over the epoch's batches; params/m/v/BN-running-stats are DMA'd
HBM→VMEM once on grid step 0, updated in place by every step, and flushed
back on the last step. HBM sees the streamed batch blocks plus ONE state
load/store per epoch instead of per step. The tri-modal state is ~22 MB fp32
(vs ~11 MB directional) — above Mosaic's default 16 MB scoped-VMEM budget, so
the kernel raises ``vmem_limit_bytes``; v5e's physical VMEM accommodates it.

Per grid step the kernel computes the reference's full tri-modal train step
(SURVEY §3.2/§2.1): three encoder forwards (train-mode BatchNorm, dropout
from the in-kernel TPU PRNG), arithmetic-mean posterior fusion of the three
Gaussians (vae.py:64-71), reparameterization (Box–Muller), three decoder
forwards, the loss MSE-sum(RNA) + BCE-sum(DNA) + γ·weighted-CE-sum(site) +
β·KLD (losses.py:8-46), the hand-derived backward for all 39 parameter
tensors, torch-order AdamW updates, and the three BatchNorm running-stat
updates.

Equivalence: with injected noise the epoch kernel matches a scan of
`fused_train_multimodal.multimodal_fused_train_step` + `optim.adamw_update`
(tests/test_pallas_epoch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_los_angeles_tpu.ops.nn import BN_MOMENTUM
from vae_los_angeles_tpu.ops.optim import ADAM_B1, ADAM_B2, ADAM_EPS
from vae_los_angeles_tpu.ops.pallas.fused_train import (
    DROPOUT_RATE,
    check_noise_args,
    _bn_train_bwd,
    _bn_train_fwd,
    _box_muller,
    _dot,
    _interpret,
    _rand_uniform,
)
from vae_los_angeles_tpu.ops.pallas.fused_train_multimodal import (
    PARAM_ORDER_MM,
    _flatten_mm,
    _unflatten_mm,
)

N_MM = len(PARAM_ORDER_MM)  # 39
N_BN = 6  # encoder_a bn + encoder_b bn1/bn2, (mean, var) each


def _mm_epoch_kernel(*refs):
    """Positional ref layout (built in `_mm_epoch_call`):
    scalars: seed, beta, gamma_w, lr, wd, step0, use_prng            [SMEM]
    data:    a(B,Da), b(B,Db), oh(B,S), cw(B,1), eps(B,L),
             dropa(B,128), dropb1(B,512), dropb2(B,256)              [grid-blocked]
    state-in: p0..p38, m0..m38, v0..v38, 6 BN arrays                 [HBM/ANY]
    outputs:  loss rows, grid-streamed in 8-step (8,128) blocks, then the state arrays
    scratch:  VMEM copies of the state, persistent across grid steps
    """
    n_state = 3 * N_MM + N_BN
    (seed_ref, beta_ref, gamma_w_ref, lr_ref, wd_ref, step0_ref,
     use_prng_ref) = refs[:7]
    a_ref, b_ref, oh_ref, cw_ref = refs[7:11]
    eps_ref, dropa_ref, dropb1_ref, dropb2_ref = refs[11:15]
    state_in = refs[15 : 15 + n_state]  # HBM (memory_space=ANY)
    out_refs = refs[15 + n_state : 15 + n_state + 1 + n_state]
    scratch = refs[15 + n_state + 1 + n_state : -1]
    dma_sem = refs[-1]
    losses_out = out_refs[0]  # (8, 128) block shared by 8 grid steps
    state_out = out_refs[1:]

    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for src, dst in zip(state_in, scratch):
            dma = pltpu.make_async_copy(src, dst, dma_sem)
            dma.start()
            dma.wait()

    p = scratch[:N_MM]
    m = scratch[N_MM : 2 * N_MM]
    v = scratch[2 * N_MM : 3 * N_MM]
    (a_rm, a_rv, b_rm1, b_rv1, b_rm2, b_rv2) = scratch[3 * N_MM : 3 * N_MM + N_BN]

    (a_w1, a_b1, a_gamma, a_betap, a_wmu, a_bmu, a_wlv, a_blv,
     b_w1, b_b1, b_gamma1, b_beta1, b_w2, b_b2, b_gamma2, b_beta2,
     b_wmu, b_bmu, b_wlv, b_blv,
     emb, c_wmu, c_bmu, c_wlv, c_blv,
     da_w1, da_b1, da_w2, da_b2,
     db_w1, db_b1, db_w2, db_b2, db_w3, db_b3,
     dc_w1, dc_b1, dc_w2, dc_b2) = p

    pltpu.prng_seed(seed_ref[0] + i)
    beta = beta_ref[0]
    gamma_w = gamma_w_ref[0]
    use_prng = (use_prng_ref[0] == 1).astype(jnp.float32)
    keep = 1.0 - DROPOUT_RATE
    a = a_ref[:]
    b = b_ref[:]
    oh = oh_ref[:]
    batch = a.shape[0]

    def dropout(shape, provided):
        return use_prng * (_rand_uniform(shape) < keep).astype(jnp.float32) + (
            1.0 - use_prng
        ) * provided

    # ---- EncoderA forward ----
    aa1 = _dot(a, a_w1[:]) + a_b1[:]
    ah, axhat, ainv, amu_b, avar_b = _bn_train_fwd(aa1, a_gamma[:], a_betap[:])
    armask = (ah > 0).astype(jnp.float32)
    adrop = dropout(ah.shape, dropa_ref[:])
    ad = ah * armask * adrop / keep
    mu_a = _dot(ad, a_wmu[:]) + a_bmu[:]
    lv_a = _dot(ad, a_wlv[:]) + a_blv[:]

    # ---- EncoderB forward ----
    ba1 = _dot(b, b_w1[:]) + b_b1[:]
    bh1, bxhat1, binv1, bmu_b1, bvar_b1 = _bn_train_fwd(ba1, b_gamma1[:], b_beta1[:])
    brmask1 = (bh1 > 0).astype(jnp.float32)
    bdrop1 = dropout(bh1.shape, dropb1_ref[:])
    bd1 = bh1 * brmask1 * bdrop1 / keep
    ba2 = _dot(bd1, b_w2[:]) + b_b2[:]
    bh2, bxhat2, binv2, bmu_b2, bvar_b2 = _bn_train_fwd(ba2, b_gamma2[:], b_beta2[:])
    brmask2 = (bh2 > 0).astype(jnp.float32)
    bdrop2 = dropout(bh2.shape, dropb2_ref[:])
    bd2 = bh2 * brmask2 * bdrop2 / keep
    mu_b = _dot(bd2, b_wmu[:]) + b_bmu[:]
    lv_b = _dot(bd2, b_wlv[:]) + b_blv[:]

    # ---- EncoderC forward ----
    e = _dot(oh, emb[:])
    mu_c = _dot(e, c_wmu[:]) + c_bmu[:]
    lv_c = _dot(e, c_wlv[:]) + c_blv[:]

    third = 1.0 / 3.0
    mu = (mu_a + mu_b + mu_c) * third
    lv = (lv_a + lv_b + lv_c) * third

    eps = use_prng * _box_muller(mu.shape) + (1.0 - use_prng) * eps_ref[:]
    sigma = jnp.exp(0.5 * lv)
    z = mu + eps * sigma

    # ---- decoders ----
    ua = _dot(z, da_w1[:]) + da_b1[:]
    ma = (ua > 0).astype(jnp.float32)
    ra = ua * ma
    recon_a = _dot(ra, da_w2[:]) + da_b2[:]

    ub1 = _dot(z, db_w1[:]) + db_b1[:]
    mb1 = (ub1 > 0).astype(jnp.float32)
    rb1 = ub1 * mb1
    ub2 = _dot(rb1, db_w2[:]) + db_b2[:]
    mb2 = (ub2 > 0).astype(jnp.float32)
    rb2 = ub2 * mb2
    logits_b = _dot(rb2, db_w3[:]) + db_b3[:]

    uc = _dot(z, dc_w1[:]) + dc_b1[:]
    mc = (uc > 0).astype(jnp.float32)
    rc = uc * mc
    logits_c = _dot(rc, dc_w2[:]) + dc_b2[:]

    # ---- loss: MSE-sum + BCE-sum + γ·weighted-CE-sum + β·KLD ----
    diff_a = recon_a - a
    mse = jnp.sum(diff_a * diff_a)
    bce = jnp.sum(
        jnp.maximum(logits_b, 0.0)
        - logits_b * b
        + jnp.log1p(jnp.exp(-jnp.abs(logits_b)))
    )
    zmax = jnp.max(logits_c, axis=1, keepdims=True)
    shifted = logits_c - zmax
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
    log_probs = shifted - lse
    w_row = cw_ref[:]  # (B, 1) class weight of each sample's label
    nll = -jnp.sum(log_probs * oh, axis=1, keepdims=True)
    ce = jnp.sum(w_row * nll)
    kld = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    losses_out[pl.ds(i % 8, 1), :] = jnp.full(
        (1, 128), mse + bce + gamma_w * ce + beta * kld, jnp.float32
    )

    unbias = batch / max(batch - 1, 1)
    a_rm[:] = (1.0 - BN_MOMENTUM) * a_rm[:] + BN_MOMENTUM * amu_b
    a_rv[:] = (1.0 - BN_MOMENTUM) * a_rv[:] + BN_MOMENTUM * avar_b * unbias
    b_rm1[:] = (1.0 - BN_MOMENTUM) * b_rm1[:] + BN_MOMENTUM * bmu_b1
    b_rv1[:] = (1.0 - BN_MOMENTUM) * b_rv1[:] + BN_MOMENTUM * bvar_b1 * unbias
    b_rm2[:] = (1.0 - BN_MOMENTUM) * b_rm2[:] + BN_MOMENTUM * bmu_b2
    b_rv2[:] = (1.0 - BN_MOMENTUM) * b_rv2[:] + BN_MOMENTUM * bvar_b2 * unbias

    # ---------------- backward + in-place AdamW ----------------
    lr = lr_ref[0]
    wd = wd_ref[0]
    t_step = (step0_ref[0] + i + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(t_step * np.log(ADAM_B1))
    bc2 = 1.0 - jnp.exp(t_step * np.log(ADAM_B2))

    def adamw(p_ref, m_ref, v_ref, g):
        new_m = ADAM_B1 * m_ref[:] + (1.0 - ADAM_B1) * g
        new_v = ADAM_B2 * v_ref[:] + (1.0 - ADAM_B2) * g * g
        m_ref[:] = new_m
        v_ref[:] = new_v
        p_ref[:] = p_ref[:] * (1.0 - lr * wd) - lr * (new_m / bc1) / (
            jnp.sqrt(new_v / bc2) + ADAM_EPS
        )

    (m_a_w1, m_a_b1, m_a_gamma, m_a_beta, m_a_wmu, m_a_bmu, m_a_wlv, m_a_blv,
     m_b_w1, m_b_b1, m_b_gamma1, m_b_beta1, m_b_w2, m_b_b2, m_b_gamma2,
     m_b_beta2, m_b_wmu, m_b_bmu, m_b_wlv, m_b_blv,
     m_emb, m_c_wmu, m_c_bmu, m_c_wlv, m_c_blv,
     m_da_w1, m_da_b1, m_da_w2, m_da_b2,
     m_db_w1, m_db_b1, m_db_w2, m_db_b2, m_db_w3, m_db_b3,
     m_dc_w1, m_dc_b1, m_dc_w2, m_dc_b2) = m
    (v_a_w1, v_a_b1, v_a_gamma, v_a_beta, v_a_wmu, v_a_bmu, v_a_wlv, v_a_blv,
     v_b_w1, v_b_b1, v_b_gamma1, v_b_beta1, v_b_w2, v_b_b2, v_b_gamma2,
     v_b_beta2, v_b_wmu, v_b_bmu, v_b_wlv, v_b_blv,
     v_emb, v_c_wmu, v_c_bmu, v_c_wlv, v_c_blv,
     v_da_w1, v_da_b1, v_da_w2, v_da_b2,
     v_db_w1, v_db_b1, v_db_w2, v_db_b2, v_db_w3, v_db_b3,
     v_dc_w1, v_dc_b1, v_dc_w2, v_dc_b2) = v

    # NOTE on ordering: each weight's downstream gradient (dot with w.T) is
    # computed BEFORE that weight's in-place AdamW update.

    # DecoderA backward (MSE)
    drecon_a = 2.0 * diff_a
    dua = _dot(drecon_a, da_w2[:].T) * ma
    adamw(da_w2, m_da_w2, v_da_w2, _dot(ra.T, drecon_a))
    adamw(da_b2, m_da_b2, v_da_b2, jnp.sum(drecon_a, axis=0))
    dz = _dot(dua, da_w1[:].T)
    adamw(da_w1, m_da_w1, v_da_w1, _dot(z.T, dua))
    adamw(da_b1, m_da_b1, v_da_b1, jnp.sum(dua, axis=0))

    # DecoderB backward (BCE with logits)
    dlogits_b = jax.nn.sigmoid(logits_b) - b
    dub2 = _dot(dlogits_b, db_w3[:].T) * mb2
    adamw(db_w3, m_db_w3, v_db_w3, _dot(rb2.T, dlogits_b))
    adamw(db_b3, m_db_b3, v_db_b3, jnp.sum(dlogits_b, axis=0))
    dub1 = _dot(dub2, db_w2[:].T) * mb1
    adamw(db_w2, m_db_w2, v_db_w2, _dot(rb1.T, dub2))
    adamw(db_b2, m_db_b2, v_db_b2, jnp.sum(dub2, axis=0))
    dz = dz + _dot(dub1, db_w1[:].T)
    adamw(db_w1, m_db_w1, v_db_w1, _dot(z.T, dub1))
    adamw(db_b1, m_db_b1, v_db_b1, jnp.sum(dub1, axis=0))

    # DecoderC backward (γ·weighted-CE)
    softmax_c = jnp.exp(log_probs)
    dlogits_c = gamma_w * w_row * (softmax_c - oh)
    duc = _dot(dlogits_c, dc_w2[:].T) * mc
    adamw(dc_w2, m_dc_w2, v_dc_w2, _dot(rc.T, dlogits_c))
    adamw(dc_b2, m_dc_b2, v_dc_b2, jnp.sum(dlogits_c, axis=0))
    dz = dz + _dot(duc, dc_w1[:].T)
    adamw(dc_w1, m_dc_w1, v_dc_w1, _dot(z.T, duc))
    adamw(dc_b1, m_dc_b1, v_dc_b1, jnp.sum(duc, axis=0))

    # reparameterize + KL
    dmu = dz + beta * mu
    dlv = dz * eps * 0.5 * sigma + (-0.5 * beta) * (1.0 - jnp.exp(lv))
    dmu3 = third * dmu
    dlv3 = third * dlv

    # EncoderC backward
    de = _dot(dmu3, c_wmu[:].T) + _dot(dlv3, c_wlv[:].T)
    adamw(c_wmu, m_c_wmu, v_c_wmu, _dot(e.T, dmu3))
    adamw(c_bmu, m_c_bmu, v_c_bmu, jnp.sum(dmu3, axis=0))
    adamw(c_wlv, m_c_wlv, v_c_wlv, _dot(e.T, dlv3))
    adamw(c_blv, m_c_blv, v_c_blv, jnp.sum(dlv3, axis=0))
    adamw(emb, m_emb, v_emb, _dot(oh.T, de))

    # EncoderA backward
    dad = _dot(dmu3, a_wmu[:].T) + _dot(dlv3, a_wlv[:].T)
    adamw(a_wmu, m_a_wmu, v_a_wmu, _dot(ad.T, dmu3))
    adamw(a_bmu, m_a_bmu, v_a_bmu, jnp.sum(dmu3, axis=0))
    adamw(a_wlv, m_a_wlv, v_a_wlv, _dot(ad.T, dlv3))
    adamw(a_blv, m_a_blv, v_a_blv, jnp.sum(dlv3, axis=0))
    dah = dad * adrop / keep * armask
    da1_, dgam_a, dbeta_a = _bn_train_bwd(dah, axhat, ainv, a_gamma[:])
    adamw(a_gamma, m_a_gamma, v_a_gamma, dgam_a)
    adamw(a_betap, m_a_beta, v_a_beta, dbeta_a)
    adamw(a_w1, m_a_w1, v_a_w1, _dot(a.T, da1_))
    adamw(a_b1, m_a_b1, v_a_b1, jnp.sum(da1_, axis=0))

    # EncoderB backward
    dbd2 = _dot(dmu3, b_wmu[:].T) + _dot(dlv3, b_wlv[:].T)
    adamw(b_wmu, m_b_wmu, v_b_wmu, _dot(bd2.T, dmu3))
    adamw(b_bmu, m_b_bmu, v_b_bmu, jnp.sum(dmu3, axis=0))
    adamw(b_wlv, m_b_wlv, v_b_wlv, _dot(bd2.T, dlv3))
    adamw(b_blv, m_b_blv, v_b_blv, jnp.sum(dlv3, axis=0))
    dbh2 = dbd2 * bdrop2 / keep * brmask2
    dba2, dgam_b2, dbeta_b2 = _bn_train_bwd(dbh2, bxhat2, binv2, b_gamma2[:])
    dbd1 = _dot(dba2, b_w2[:].T)
    adamw(b_gamma2, m_b_gamma2, v_b_gamma2, dgam_b2)
    adamw(b_beta2, m_b_beta2, v_b_beta2, dbeta_b2)
    adamw(b_w2, m_b_w2, v_b_w2, _dot(bd1.T, dba2))
    adamw(b_b2, m_b_b2, v_b_b2, jnp.sum(dba2, axis=0))
    dbh1 = dbd1 * bdrop1 / keep * brmask1
    dba1, dgam_b1, dbeta_b1 = _bn_train_bwd(dbh1, bxhat1, binv1, b_gamma1[:])
    adamw(b_gamma1, m_b_gamma1, v_b_gamma1, dgam_b1)
    adamw(b_beta1, m_b_beta1, v_b_beta1, dbeta_b1)
    adamw(b_w1, m_b_w1, v_b_w1, _dot(b.T, dba1))
    adamw(b_b1, m_b_b1, v_b_b1, jnp.sum(dba1, axis=0))

    @pl.when(i == n_steps - 1)
    def _():
        for src, dst in zip(scratch, state_out):
            dma = pltpu.make_async_copy(src, dst, dma_sem)
            dma.start()
            dma.wait()


@functools.partial(jax.jit, static_argnames=("n_batches", "use_prng"))
def _mm_epoch_call(flat_p, flat_m, flat_v, bn_list, a_ep, b_ep, oh_ep, cw_ep,
                   eps_ep, dropa_ep, dropb1_ep, dropb2_ep, seed, beta, gamma_w,
                   lr, wd, step0, n_batches: int, use_prng: bool):
    batch = a_ep.shape[0] // n_batches
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def stream(width):
        return pl.BlockSpec(
            (batch, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    def noise(arr):
        # with the in-kernel PRNG the eps/dropout inputs are 1-row dummies
        # fetched once (constant index map) — zero streamed HBM traffic
        if use_prng:
            return const((arr.shape[0], arr.shape[1]))
        return stream(arr.shape[1])
    p_list = [flat_p[k] for k, _ in PARAM_ORDER_MM]
    m_list = [flat_m[k] for k, _ in PARAM_ORDER_MM]
    v_list = [flat_v[k] for k, _ in PARAM_ORDER_MM]
    state_arrays = p_list + m_list + v_list + list(bn_list)
    state_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in state_arrays]

    in_specs = (
        [smem] * 7
        + [
            stream(a_ep.shape[1]),
            stream(b_ep.shape[1]),
            stream(oh_ep.shape[1]),
            stream(cw_ep.shape[1]),
            noise(eps_ep),
            noise(dropa_ep),
            noise(dropb1_ep),
            noise(dropb2_ep),
        ]
        + state_specs
    )
    nb_pad = -(-n_batches // 8) * 8
    out_shape = (
        [jax.ShapeDtypeStruct((nb_pad, 128), jnp.float32)]
        + [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in state_arrays]
    )
    out_specs = [
        # per-step loss rows streamed back to HBM in 8-step blocks:
        # O(1) VMEM at any n_batches
        pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.VMEM)
    ] + state_specs
    scratch_shapes = [pltpu.VMEM(x.shape, jnp.float32) for x in state_arrays] + [
        pltpu.SemaphoreType.DMA(()),
    ]
    outs = pl.pallas_call(
        _mm_epoch_kernel,
        grid=(n_batches,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # tri-modal p+m+v ≈ 22 MB fp32 — above the 16 MB default budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([gamma_w], jnp.float32),
        jnp.asarray([lr], jnp.float32),
        jnp.asarray([wd], jnp.float32),
        jnp.asarray([step0], jnp.int32),
        jnp.asarray([1 if use_prng else 0], jnp.int32),
        a_ep, b_ep, oh_ep, cw_ep, eps_ep, dropa_ep, dropb1_ep, dropb2_ep,
        *state_arrays,
    )
    losses = outs[0][:n_batches, 0]
    arrs = outs[1:]
    new_p = {k: arrs[j] for j, (k, _) in enumerate(PARAM_ORDER_MM)}
    new_m = {k: arrs[N_MM + j] for j, (k, _) in enumerate(PARAM_ORDER_MM)}
    new_v = {k: arrs[2 * N_MM + j] for j, (k, _) in enumerate(PARAM_ORDER_MM)}
    return losses, new_p, new_m, new_v, arrs[3 * N_MM :]


def multimodal_fused_epoch(
    params, opt_m, opt_v, bn_state, a_ep, b_ep, site_ep, n_sites, *,
    seed=0, beta=1e-3, gamma=1.0, class_weights=None, lr=5e-4,
    weight_decay=1e-5, step0=0, n_batches,
    eps_ep=None, dropa_ep=None, dropb1_ep=None, dropb2_ep=None,
):
    """One full tri-modal epoch (n_batches AdamW steps) in a single kernel.

    Inputs are the epoch's pre-permuted, batch-concatenated arrays
    (n_batches*B rows). Returns (per-batch losses, new_params, new_m, new_v,
    new_bn_state)."""
    if a_ep.shape[0] % n_batches:
        raise ValueError(
            f"epoch row count {a_ep.shape[0]} not divisible by n_batches="
            f"{n_batches}: rows would be silently dropped and every batch "
            "boundary shifted relative to the caller's batching"
        )
    flat_p = _flatten_mm(params)
    flat_m = _flatten_mm(opt_m)
    flat_v = _flatten_mm(opt_v)
    site = jnp.asarray(site_ep)
    onehot = jax.nn.one_hot(site, n_sites, dtype=jnp.float32)
    if class_weights is None:
        cw_ep = jnp.ones((a_ep.shape[0], 1), jnp.float32)
    else:
        cw_ep = jnp.take(jnp.asarray(class_weights, jnp.float32), site)[:, None]
    use_prng = check_noise_args(
        eps_ep=eps_ep, dropa_ep=dropa_ep, dropb1_ep=dropb1_ep,
        dropb2_ep=dropb2_ep,
    )
    latent = flat_p["a_wmu"].shape[1]
    # in PRNG mode the noise inputs are 1-row dummies (never read; the
    # BlockSpec fetches them once instead of streaming n_rows per epoch)
    n_ph = 1 if use_prng else a_ep.shape[0]
    if eps_ep is None:
        eps_ep = jnp.zeros((n_ph, latent), jnp.float32)
    if dropa_ep is None:
        dropa_ep = jnp.ones((n_ph, flat_p["a_w1"].shape[1]), jnp.float32)
    if dropb1_ep is None:
        dropb1_ep = jnp.ones((n_ph, flat_p["b_w1"].shape[1]), jnp.float32)
    if dropb2_ep is None:
        dropb2_ep = jnp.ones((n_ph, flat_p["b_w2"].shape[1]), jnp.float32)
    bn_list = [
        bn_state["encoder_a"]["bn"]["mean"], bn_state["encoder_a"]["bn"]["var"],
        bn_state["encoder_b"]["bn1"]["mean"], bn_state["encoder_b"]["bn1"]["var"],
        bn_state["encoder_b"]["bn2"]["mean"], bn_state["encoder_b"]["bn2"]["var"],
    ]
    losses, new_p, new_m, new_v, bn_out = _mm_epoch_call(
        flat_p, flat_m, flat_v, bn_list,
        jnp.asarray(a_ep, jnp.float32),
        jnp.asarray(b_ep, jnp.float32),
        onehot, cw_ep,
        jnp.asarray(eps_ep, jnp.float32),
        jnp.asarray(dropa_ep, jnp.float32),
        jnp.asarray(dropb1_ep, jnp.float32),
        jnp.asarray(dropb2_ep, jnp.float32),
        seed, beta, gamma, lr, weight_decay, step0, int(n_batches), use_prng,
    )
    new_bn = {
        "encoder_a": {"bn": {"mean": bn_out[0], "var": bn_out[1]}},
        "encoder_b": {
            "bn1": {"mean": bn_out[2], "var": bn_out[3]},
            "bn2": {"mean": bn_out[4], "var": bn_out[5]},
        },
    }
    return (
        losses,
        _unflatten_mm(new_p),
        _unflatten_mm(new_m),
        _unflatten_mm(new_v),
        new_bn,
    )
