"""Whole-EPOCH megakernel for RNA2DNAVAE: every SGD step of an epoch runs
inside ONE Pallas kernel, with parameters AND AdamW moments VMEM-resident.

Why: at batch 32 the per-step fused kernel is bound by optimizer-state HBM
traffic — each step reads/writes params+m+v (~28 MB) from HBM. Here the
grid iterates over the epoch's batches while params/m/v live in VMEM for the
entire epoch: the state operands sit in ANY (HBM) space as separate input
and output buffers, the kernel DMAs them into VMEM scratch once at grid
step 0 and DMAs the updated state back out at the last grid step. HBM sees
only the streaming batch data (~0.3 MB/step, double-buffered by the
pipeline) plus one param/opt load+store per EPOCH instead of per STEP.

Per grid step i the kernel runs the full train step in-place:
  forward (Linear→train-BN→ReLU→Dropout → mean-fuse site posterior →
  reparameterize → 3-layer decode) → BCE+β·KL loss → hand-derived backward
  for all 19 parameter tensors → torch-order AdamW update (decoupled decay,
  bias correction at global step step0+i+1) → BN running-stats update.

VMEM budget at the live dims (1177/1211, latent 20): params+m+v ≈ 11 MB,
streaming blocks + activations ≈ 3 MB — inside the ~16 MB/core budget.

Equivalence: with injected per-step noise the epoch kernel matches a scan of
`fused_train.rna2dna_fused_train_step` + `optim.adamw_update` to fp32
tolerance (tests/test_pallas_epoch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_los_angeles_tpu.ops.nn import BN_EPS, BN_MOMENTUM
from vae_los_angeles_tpu.ops.optim import ADAM_B1, ADAM_B2, ADAM_EPS
from vae_los_angeles_tpu.ops.pallas.fused_vae import scoped_vmem_limit
from vae_los_angeles_tpu.ops.pallas.fused_train import (
    DROPOUT_RATE,
    PARAM_ORDER,
    check_noise_args,
    _box_muller,
    _dot,
    _flatten_params,
    _interpret,
    _rand_uniform,
    _unflatten_grads,
)
N_P = len(PARAM_ORDER)  # 19


def _epoch_kernel(*refs):
    """Positional ref layout (built in `_epoch_call`):
    scalars: seed, beta, lr, wd, step0, use_prng                    [SMEM]
    data:    x(B,Da), t(B,Db), oh(B,S), eps(B,L), drop(B,128)       [grid-blocked]
    state-in: p0..p18, m0..m18, v0..v18, rm, rv                     [const blocks]
    outputs:  loss rows, grid-streamed in 8-step (8,128) blocks, p'…, m'…, v'…, rm', rv'
    scratch:  VMEM copies of p/m/v/rm/rv, persistent across grid steps
    """
    n_state = 3 * N_P + 2
    (seed_ref, beta_ref, lr_ref, wd_ref, step0_ref, use_prng_ref) = refs[:6]
    x_ref, t_ref, oh_ref, eps_ref, drop_ref = refs[6:11]
    state_in = refs[11 : 11 + n_state]  # HBM (memory_space=ANY)
    out_refs = refs[11 + n_state : 11 + n_state + 1 + n_state]
    scratch = refs[11 + n_state + 1 + n_state : -1]
    dma_sem = refs[-1]
    losses_out = out_refs[0]  # (8, 128) block shared by 8 grid steps
    state_out = out_refs[1:]  # HBM (memory_space=ANY)

    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    # DMA the state HBM→VMEM scratch on the first step (state inputs stay in
    # HBM so the VMEM footprint is params+moments ONCE, not twice)
    @pl.when(i == 0)
    def _():
        for src, dst in zip(state_in, scratch):
            dma = pltpu.make_async_copy(src, dst, dma_sem)
            dma.start()
            dma.wait()

    p = scratch[:N_P]
    m = scratch[N_P : 2 * N_P]
    v = scratch[2 * N_P : 3 * N_P]
    rm_ref, rv_ref = scratch[3 * N_P], scratch[3 * N_P + 1]
    (w1, b1, gamma, bnbeta, wmu, bmu, wlv, blv, emb,
     smu_w, smu_b, slv_w, slv_b, d1w, d1b, d2w, d2b, d3w, d3b) = p

    pltpu.prng_seed(seed_ref[0] + i)
    beta = beta_ref[0]
    use_prng = (use_prng_ref[0] == 1).astype(jnp.float32)
    keep = 1.0 - DROPOUT_RATE
    x = x_ref[:]
    t = t_ref[:]
    batch = x.shape[0]

    # ---------------- forward ----------------
    a1 = _dot(x, w1[:]) + b1[:]
    mu_b = jnp.mean(a1, axis=0)
    var_b = jnp.mean(jnp.square(a1 - mu_b), axis=0)
    inv_std = jax.lax.rsqrt(var_b + BN_EPS)
    xhat = (a1 - mu_b) * inv_std
    h = xhat * gamma[:] + bnbeta[:]
    rmask = (h > 0).astype(jnp.float32)
    r = h * rmask
    drop = use_prng * (_rand_uniform(r.shape) < keep).astype(jnp.float32) + (
        1.0 - use_prng
    ) * drop_ref[:]
    d = r * drop / keep

    mu_r = _dot(d, wmu[:]) + bmu[:]
    lv_r = _dot(d, wlv[:]) + blv[:]
    e = _dot(oh_ref[:], emb[:])
    mu_s = _dot(e, smu_w[:]) + smu_b[:]
    lv_s = _dot(e, slv_w[:]) + slv_b[:]
    mu = 0.5 * (mu_r + mu_s)
    lv = 0.5 * (lv_r + lv_s)

    eps = use_prng * _box_muller(mu.shape) + (1.0 - use_prng) * eps_ref[:]
    sigma = jnp.exp(0.5 * lv)
    z = mu + eps * sigma

    u1 = _dot(z, d1w[:]) + d1b[:]
    m1 = (u1 > 0).astype(jnp.float32)
    r1 = u1 * m1
    u2 = _dot(r1, d2w[:]) + d2b[:]
    m2 = (u2 > 0).astype(jnp.float32)
    r2 = u2 * m2
    logits = _dot(r2, d3w[:]) + d3b[:]

    bce = jnp.sum(
        jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    kld = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    # Mosaic cannot store scalars to VMEM: broadcast the loss across row
    # i%8 of the streamed block (flushed to HBM every 8 steps, so the loss
    # trace costs O(1) VMEM regardless of n_batches)
    losses_out[pl.ds(i % 8, 1), :] = jnp.full(
        (1, 128), bce + beta * kld, jnp.float32
    )

    unbias = batch / max(batch - 1, 1)
    rm_ref[:] = (1.0 - BN_MOMENTUM) * rm_ref[:] + BN_MOMENTUM * mu_b
    rv_ref[:] = (1.0 - BN_MOMENTUM) * rv_ref[:] + BN_MOMENTUM * var_b * unbias

    # ---------------- backward + in-place AdamW per tensor ----------------
    lr = lr_ref[0]
    wd = wd_ref[0]
    t_step = (step0_ref[0] + i + 1).astype(jnp.float32)
    # Mosaic has no powf: b^t = exp(t·ln b)
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

    (mw1, mb1, mgam, mbb, mwmu, mbmu, mwlv, mblv, memb,
     msmu_w, msmu_b, mslv_w, mslv_b, md1w, md1b, md2w, md2b, md3w, md3b) = m
    (vw1, vb1, vgam, vbb, vwmu, vbmu, vwlv, vblv, vemb,
     vsmu_w, vsmu_b, vslv_w, vslv_b, vd1w, vd1b, vd2w, vd2b, vd3w, vd3b) = v

    dlogits = jax.nn.sigmoid(logits) - t
    # NOTE: gradients consumed immediately per-layer to bound VMEM pressure
    dr2 = _dot(dlogits, d3w[:].T)  # uses pre-update d3w: compute before adamw
    adamw(d3w, md3w, vd3w, _dot(r2.T, dlogits))
    adamw(d3b, md3b, vd3b, jnp.sum(dlogits, axis=0))
    du2 = dr2 * m2
    dr1 = _dot(du2, d2w[:].T)
    adamw(d2w, md2w, vd2w, _dot(r1.T, du2))
    adamw(d2b, md2b, vd2b, jnp.sum(du2, axis=0))
    du1 = dr1 * m1
    dz = _dot(du1, d1w[:].T)
    adamw(d1w, md1w, vd1w, _dot(z.T, du1))
    adamw(d1b, md1b, vd1b, jnp.sum(du1, axis=0))

    dmu = dz + beta * mu
    dlv = dz * eps * 0.5 * sigma + (-0.5 * beta) * (1.0 - jnp.exp(lv))
    dmu_half = 0.5 * dmu
    dlv_half = 0.5 * dlv

    dd = _dot(dmu_half, wmu[:].T) + _dot(dlv_half, wlv[:].T)
    adamw(wmu, mwmu, vwmu, _dot(d.T, dmu_half))
    adamw(bmu, mbmu, vbmu, jnp.sum(dmu_half, axis=0))
    adamw(wlv, mwlv, vwlv, _dot(d.T, dlv_half))
    adamw(blv, mblv, vblv, jnp.sum(dlv_half, axis=0))

    de = _dot(dmu_half, smu_w[:].T) + _dot(dlv_half, slv_w[:].T)
    adamw(smu_w, msmu_w, vsmu_w, _dot(e.T, dmu_half))
    adamw(smu_b, msmu_b, vsmu_b, jnp.sum(dmu_half, axis=0))
    adamw(slv_w, mslv_w, vslv_w, _dot(e.T, dlv_half))
    adamw(slv_b, mslv_b, vslv_b, jnp.sum(dlv_half, axis=0))
    adamw(emb, memb, vemb, _dot(oh_ref[:].T, de))

    dr = dd * drop / keep
    dh = dr * rmask
    dxhat = dh * gamma[:]
    adamw(gamma, mgam, vgam, jnp.sum(dh * xhat, axis=0))
    adamw(bnbeta, mbb, vbb, jnp.sum(dh, axis=0))
    da1 = inv_std * (
        dxhat - jnp.mean(dxhat, axis=0) - xhat * jnp.mean(dxhat * xhat, axis=0)
    )
    adamw(w1, mw1, vw1, _dot(x.T, da1))
    adamw(b1, mb1, vb1, jnp.sum(da1, axis=0))

    # flush the final state to the outputs on the last step
    @pl.when(i == n_steps - 1)
    def _():
        for src, dst in zip(scratch, state_out):
            dma = pltpu.make_async_copy(src, dst, dma_sem)
            dma.start()
            dma.wait()


@functools.partial(jax.jit, static_argnames=("n_batches", "use_prng"))
def _epoch_call(flat_p, flat_m, flat_v, rm, rv, x_ep, t_ep, oh_ep, eps_ep,
                drop_ep, seed, beta, lr, wd, step0, n_batches: int,
                use_prng: bool):
    batch = x_ep.shape[0] // n_batches
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

    p_list = [flat_p[k] for k, _ in PARAM_ORDER]
    m_list = [flat_m[k] for k, _ in PARAM_ORDER]
    v_list = [flat_v[k] for k, _ in PARAM_ORDER]
    state_arrays = p_list + m_list + v_list + [rm, rv]
    # state stays in HBM; the kernel DMAs it into persistent VMEM scratch
    state_specs = [
        pl.BlockSpec(memory_space=pl.ANY) for _ in state_arrays
    ]

    in_specs = (
        [smem] * 6
        + [
            stream(x_ep.shape[1]),
            stream(t_ep.shape[1]),
            stream(oh_ep.shape[1]),
            noise(eps_ep),
            noise(drop_ep),
        ]
        + state_specs
    )
    nb_pad = -(-n_batches // 8) * 8
    out_shape = (
        [jax.ShapeDtypeStruct((nb_pad, 128), jnp.float32)]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in state_arrays]
    )
    out_specs = (
        # loss rows streamed back to HBM in 8-step blocks: O(1) VMEM
        [pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.VMEM)]
        + state_specs
    )
    scratch_shapes = [pltpu.VMEM(a.shape, jnp.float32) for a in state_arrays] + [
        pltpu.SemaphoreType.DMA(()),
    ]
    outs = pl.pallas_call(
        _epoch_kernel,
        grid=(n_batches,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # raised scoped-VMEM cap where the chip has it (see
            # scoped_vmem_limit: batch>128 needs >16 MB; v2/v3 keep default)
            vmem_limit_bytes=scoped_vmem_limit(),
        ),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([lr], jnp.float32),
        jnp.asarray([wd], jnp.float32),
        jnp.asarray([step0], jnp.int32),
        jnp.asarray([1 if use_prng else 0], jnp.int32),
        x_ep, t_ep, oh_ep, eps_ep, drop_ep,
        *state_arrays,
    )
    losses = outs[0][:n_batches, 0]
    new_state_arrays = outs[1:]
    new_p = {k: new_state_arrays[j] for j, (k, _) in enumerate(PARAM_ORDER)}
    new_m = {k: new_state_arrays[N_P + j] for j, (k, _) in enumerate(PARAM_ORDER)}
    new_v = {k: new_state_arrays[2 * N_P + j] for j, (k, _) in enumerate(PARAM_ORDER)}
    new_rm, new_rv = new_state_arrays[-2], new_state_arrays[-1]
    return losses, new_p, new_m, new_v, new_rm, new_rv


def rna2dna_fused_epoch(
    params, opt_m, opt_v, bn_state, x_ep, t_ep, site_ep, n_sites, *,
    seed=0, beta=1e-3, lr=5e-4, weight_decay=1e-5, step0=0, n_batches,
    eps_ep=None, drop_ep=None,
):
    """Run one full epoch (n_batches AdamW steps) in a single kernel.

    Inputs are the epoch's pre-permuted, batch-concatenated arrays
    (n_batches*B rows). Returns (per-batch losses, new_params, new_m, new_v,
    new_bn_state). ``opt_m``/``opt_v`` are the AdamW moment pytrees; ``step0``
    the global step count before this epoch.
    """
    if x_ep.shape[0] % n_batches:
        raise ValueError(
            f"epoch row count {x_ep.shape[0]} not divisible by n_batches="
            f"{n_batches}: rows would be silently dropped and every batch "
            "boundary shifted relative to the caller's batching"
        )
    flat_p = _flatten_params(params)
    flat_m = _flatten_params(opt_m)
    flat_v = _flatten_params(opt_v)
    onehot = jax.nn.one_hot(jnp.asarray(site_ep), n_sites, dtype=jnp.float32)
    use_prng = check_noise_args(eps_ep=eps_ep, drop_ep=drop_ep)
    latent = flat_p["wmu"].shape[1]
    # in PRNG mode the noise inputs are 1-row dummies (never read; fetched
    # once by a constant-index BlockSpec instead of streamed per batch)
    n_ph = 1 if use_prng else x_ep.shape[0]
    if eps_ep is None:
        eps_ep = jnp.zeros((n_ph, latent), jnp.float32)
    if drop_ep is None:
        drop_ep = jnp.ones((n_ph, flat_p["w1"].shape[1]), jnp.float32)
    losses, new_p, new_m, new_v, new_rm, new_rv = _epoch_call(
        flat_p, flat_m, flat_v,
        bn_state["encoder_rna"]["bn"]["mean"],
        bn_state["encoder_rna"]["bn"]["var"],
        jnp.asarray(x_ep, jnp.float32),
        jnp.asarray(t_ep, jnp.float32),
        onehot,
        jnp.asarray(eps_ep, jnp.float32),
        jnp.asarray(drop_ep, jnp.float32),
        seed, beta, lr, weight_decay, step0, int(n_batches), use_prng,
    )
    return (
        losses,
        _unflatten_grads(new_p),
        _unflatten_grads(new_m),
        _unflatten_grads(new_v),
        {"encoder_rna": {"bn": {"mean": new_rm, "var": new_rv}}},
    )


# ---------------------------------------------------------------------------
# DNA → RNA whole-epoch megakernel (EncoderB two BN blocks, DecoderA, MSE+βKL)
# ---------------------------------------------------------------------------

from vae_los_angeles_tpu.ops.pallas.fused_train import (  # noqa: E402
    PARAM_ORDER_D2R,
    _bn_train_bwd,
    _bn_train_fwd,
    _flatten_by,
    _unflatten_by,
)

N_P_D2R = len(PARAM_ORDER_D2R)  # 21


def _d2r_epoch_kernel(*refs):
    n_state = 3 * N_P_D2R + 4  # + bn1/bn2 running mean/var
    (seed_ref, beta_ref, lr_ref, wd_ref, step0_ref, use_prng_ref) = refs[:6]
    x_ref, t_ref, oh_ref, eps_ref, drop1_ref, drop2_ref = refs[6:12]
    state_in = refs[12 : 12 + n_state]  # HBM
    out_refs = refs[12 + n_state : 12 + n_state + 1 + n_state]
    scratch = refs[12 + n_state + 1 + n_state : -1]
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

    p = scratch[:N_P_D2R]
    m = scratch[N_P_D2R : 2 * N_P_D2R]
    v = scratch[2 * N_P_D2R : 3 * N_P_D2R]
    rm1_ref, rv1_ref, rm2_ref, rv2_ref = scratch[3 * N_P_D2R : 3 * N_P_D2R + 4]
    (w1, b1, gamma1, beta1, w2, b2, gamma2, beta2, wmu, bmu, wlv, blv, emb,
     smu_w, smu_b, slv_w, slv_b, d1w, d1b, d2w, d2b) = p

    pltpu.prng_seed(seed_ref[0] + i)
    beta = beta_ref[0]
    use_prng = (use_prng_ref[0] == 1).astype(jnp.float32)
    keep = 1.0 - DROPOUT_RATE
    x = x_ref[:]
    t = t_ref[:]
    batch = x.shape[0]

    # ---- forward ----
    a1 = _dot(x, w1[:]) + b1[:]
    h1, xhat1, inv_std1, mu_b1, var_b1 = _bn_train_fwd(a1, gamma1[:], beta1[:])
    rmask1 = (h1 > 0).astype(jnp.float32)
    drop1 = use_prng * (_rand_uniform(h1.shape) < keep).astype(jnp.float32) + (
        1.0 - use_prng
    ) * drop1_ref[:]
    d1 = h1 * rmask1 * drop1 / keep
    a2 = _dot(d1, w2[:]) + b2[:]
    h2, xhat2, inv_std2, mu_b2, var_b2 = _bn_train_fwd(a2, gamma2[:], beta2[:])
    rmask2 = (h2 > 0).astype(jnp.float32)
    drop2 = use_prng * (_rand_uniform(h2.shape) < keep).astype(jnp.float32) + (
        1.0 - use_prng
    ) * drop2_ref[:]
    d2 = h2 * rmask2 * drop2 / keep

    mu_r = _dot(d2, wmu[:]) + bmu[:]
    lv_r = _dot(d2, wlv[:]) + blv[:]
    e = _dot(oh_ref[:], emb[:])
    mu = 0.5 * (mu_r + _dot(e, smu_w[:]) + smu_b[:])
    lv = 0.5 * (lv_r + _dot(e, slv_w[:]) + slv_b[:])
    eps = use_prng * _box_muller(mu.shape) + (1.0 - use_prng) * eps_ref[:]
    sigma = jnp.exp(0.5 * lv)
    z = mu + eps * sigma

    u1 = _dot(z, d1w[:]) + d1b[:]
    m1 = (u1 > 0).astype(jnp.float32)
    rd1 = u1 * m1
    recon = _dot(rd1, d2w[:]) + d2b[:]
    diff = recon - t
    kld = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    losses_out[pl.ds(i % 8, 1), :] = jnp.full(
        (1, 128), jnp.sum(diff * diff) + beta * kld, jnp.float32
    )

    unbias = batch / max(batch - 1, 1)
    rm1_ref[:] = (1.0 - BN_MOMENTUM) * rm1_ref[:] + BN_MOMENTUM * mu_b1
    rv1_ref[:] = (1.0 - BN_MOMENTUM) * rv1_ref[:] + BN_MOMENTUM * var_b1 * unbias
    rm2_ref[:] = (1.0 - BN_MOMENTUM) * rm2_ref[:] + BN_MOMENTUM * mu_b2
    rv2_ref[:] = (1.0 - BN_MOMENTUM) * rv2_ref[:] + BN_MOMENTUM * var_b2 * unbias

    # ---- backward + in-place AdamW ----
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

    (mw1, mb1, mg1, mbt1, mw2, mb2_, mg2, mbt2, mwmu, mbmu, mwlv, mblv, memb,
     msmu_w, msmu_b, mslv_w, mslv_b, md1w, md1b, md2w, md2b) = m
    (vw1, vb1, vg1, vbt1, vw2, vb2_, vg2, vbt2, vwmu, vbmu, vwlv, vblv, vemb,
     vsmu_w, vsmu_b, vslv_w, vslv_b, vd1w, vd1b, vd2w, vd2b) = v

    drecon = 2.0 * diff
    drd1 = _dot(drecon, d2w[:].T)
    adamw(d2w, md2w, vd2w, _dot(rd1.T, drecon))
    adamw(d2b, md2b, vd2b, jnp.sum(drecon, axis=0))
    du1 = drd1 * m1
    dz = _dot(du1, d1w[:].T)
    adamw(d1w, md1w, vd1w, _dot(z.T, du1))
    adamw(d1b, md1b, vd1b, jnp.sum(du1, axis=0))

    dmu = dz + beta * mu
    dlv = dz * eps * 0.5 * sigma + (-0.5 * beta) * (1.0 - jnp.exp(lv))
    dmu_half = 0.5 * dmu
    dlv_half = 0.5 * dlv

    dd2 = _dot(dmu_half, wmu[:].T) + _dot(dlv_half, wlv[:].T)
    adamw(wmu, mwmu, vwmu, _dot(d2.T, dmu_half))
    adamw(bmu, mbmu, vbmu, jnp.sum(dmu_half, axis=0))
    adamw(wlv, mwlv, vwlv, _dot(d2.T, dlv_half))
    adamw(blv, mblv, vblv, jnp.sum(dlv_half, axis=0))
    de = _dot(dmu_half, smu_w[:].T) + _dot(dlv_half, slv_w[:].T)
    adamw(smu_w, msmu_w, vsmu_w, _dot(e.T, dmu_half))
    adamw(smu_b, msmu_b, vsmu_b, jnp.sum(dmu_half, axis=0))
    adamw(slv_w, mslv_w, vslv_w, _dot(e.T, dlv_half))
    adamw(slv_b, mslv_b, vslv_b, jnp.sum(dlv_half, axis=0))
    adamw(emb, memb, vemb, _dot(oh_ref[:].T, de))

    dh2 = dd2 * drop2 / keep * rmask2
    da2, dgamma2, dbeta2 = _bn_train_bwd(dh2, xhat2, inv_std2, gamma2[:])
    dd1 = _dot(da2, w2[:].T)
    adamw(gamma2, mg2, vg2, dgamma2)
    adamw(beta2, mbt2, vbt2, dbeta2)
    adamw(w2, mw2, vw2, _dot(d1.T, da2))
    adamw(b2, mb2_, vb2_, jnp.sum(da2, axis=0))

    dh1 = dd1 * drop1 / keep * rmask1
    da1, dgamma1, dbeta1 = _bn_train_bwd(dh1, xhat1, inv_std1, gamma1[:])
    adamw(gamma1, mg1, vg1, dgamma1)
    adamw(beta1, mbt1, vbt1, dbeta1)
    adamw(w1, mw1, vw1, _dot(x.T, da1))
    adamw(b1, mb1, vb1, jnp.sum(da1, axis=0))

    @pl.when(i == n_steps - 1)
    def _():
        for src, dst in zip(scratch, state_out):
            dma = pltpu.make_async_copy(src, dst, dma_sem)
            dma.start()
            dma.wait()


@functools.partial(jax.jit, static_argnames=("n_batches", "use_prng"))
def _d2r_epoch_call(flat_p, flat_m, flat_v, rm1, rv1, rm2, rv2, x_ep, t_ep,
                    oh_ep, eps_ep, drop1_ep, drop2_ep, seed, beta, lr, wd,
                    step0, n_batches: int, use_prng: bool):
    batch = x_ep.shape[0] // n_batches
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def stream(width):
        return pl.BlockSpec(
            (batch, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    def noise(arr):
        if use_prng:
            return const((arr.shape[0], arr.shape[1]))
        return stream(arr.shape[1])

    p_list = [flat_p[k] for k, _ in PARAM_ORDER_D2R]
    m_list = [flat_m[k] for k, _ in PARAM_ORDER_D2R]
    v_list = [flat_v[k] for k, _ in PARAM_ORDER_D2R]
    state_arrays = p_list + m_list + v_list + [rm1, rv1, rm2, rv2]
    state_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in state_arrays]

    in_specs = (
        [smem] * 6
        + [
            stream(x_ep.shape[1]),
            stream(t_ep.shape[1]),
            stream(oh_ep.shape[1]),
            noise(eps_ep),
            noise(drop1_ep),
            noise(drop2_ep),
        ]
        + state_specs
    )
    nb_pad = -(-n_batches // 8) * 8
    out_shape = (
        [jax.ShapeDtypeStruct((nb_pad, 128), jnp.float32)]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in state_arrays]
    )
    out_specs = [
        pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.VMEM)
    ] + state_specs
    scratch_shapes = [pltpu.VMEM(a.shape, jnp.float32) for a in state_arrays] + [
        pltpu.SemaphoreType.DMA(()),
    ]
    outs = pl.pallas_call(
        _d2r_epoch_kernel,
        grid=(n_batches,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # raised scoped-VMEM cap where the chip has it (see
            # scoped_vmem_limit: batch>128 needs >16 MB; v2/v3 keep default)
            vmem_limit_bytes=scoped_vmem_limit(),
        ),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([lr], jnp.float32),
        jnp.asarray([wd], jnp.float32),
        jnp.asarray([step0], jnp.int32),
        jnp.asarray([1 if use_prng else 0], jnp.int32),
        x_ep, t_ep, oh_ep, eps_ep, drop1_ep, drop2_ep,
        *state_arrays,
    )
    losses = outs[0][:n_batches, 0]
    arrs = outs[1:]
    new_p = {k: arrs[j] for j, (k, _) in enumerate(PARAM_ORDER_D2R)}
    new_m = {k: arrs[N_P_D2R + j] for j, (k, _) in enumerate(PARAM_ORDER_D2R)}
    new_v = {k: arrs[2 * N_P_D2R + j] for j, (k, _) in enumerate(PARAM_ORDER_D2R)}
    return losses, new_p, new_m, new_v, arrs[-4], arrs[-3], arrs[-2], arrs[-1]


def dna2rna_fused_epoch(
    params, opt_m, opt_v, bn_state, x_ep, t_ep, site_ep, n_sites, *,
    seed=0, beta=1e-3, lr=5e-4, weight_decay=1e-5, step0=0, n_batches,
    eps_ep=None, drop1_ep=None, drop2_ep=None,
):
    """One full DNA→RNA epoch (n_batches AdamW steps) in a single kernel.
    ``x_ep`` is the epoch's DNA input, ``t_ep`` the RNA target."""
    flat_p = _flatten_by(params, PARAM_ORDER_D2R)
    if x_ep.shape[0] % n_batches:
        raise ValueError(
            f"epoch row count {x_ep.shape[0]} not divisible by n_batches="
            f"{n_batches}: rows would be silently dropped and every batch "
            "boundary shifted relative to the caller's batching"
        )
    flat_m = _flatten_by(opt_m, PARAM_ORDER_D2R)
    flat_v = _flatten_by(opt_v, PARAM_ORDER_D2R)
    onehot = jax.nn.one_hot(jnp.asarray(site_ep), n_sites, dtype=jnp.float32)
    use_prng = check_noise_args(
        eps_ep=eps_ep, drop1_ep=drop1_ep, drop2_ep=drop2_ep
    )
    latent = flat_p["wmu"].shape[1]
    n_ph = 1 if use_prng else x_ep.shape[0]
    if eps_ep is None:
        eps_ep = jnp.zeros((n_ph, latent), jnp.float32)
    if drop1_ep is None:
        drop1_ep = jnp.ones((n_ph, flat_p["w1"].shape[1]), jnp.float32)
    if drop2_ep is None:
        drop2_ep = jnp.ones((n_ph, flat_p["w2"].shape[1]), jnp.float32)
    bn = bn_state["encoder_dna"]
    losses, new_p, new_m, new_v, rm1, rv1, rm2, rv2 = _d2r_epoch_call(
        flat_p, flat_m, flat_v,
        bn["bn1"]["mean"], bn["bn1"]["var"], bn["bn2"]["mean"], bn["bn2"]["var"],
        jnp.asarray(x_ep, jnp.float32),
        jnp.asarray(t_ep, jnp.float32),
        onehot,
        jnp.asarray(eps_ep, jnp.float32),
        jnp.asarray(drop1_ep, jnp.float32),
        jnp.asarray(drop2_ep, jnp.float32),
        seed, beta, lr, weight_decay, step0, int(n_batches), use_prng,
    )
    return (
        losses,
        _unflatten_by(new_p, PARAM_ORDER_D2R),
        _unflatten_by(new_m, PARAM_ORDER_D2R),
        _unflatten_by(new_v, PARAM_ORDER_D2R),
        {
            "encoder_dna": {
                "bn1": {"mean": rm1, "var": rv1},
                "bn2": {"mean": rm2, "var": rv2},
            }
        },
    )
