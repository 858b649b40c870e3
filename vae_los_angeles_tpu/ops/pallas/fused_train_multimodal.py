"""Fully-fused Pallas TRAIN step for the tri-modal MultiModalVAE.

The BASELINE.json north star verbatim: "the PyTorch MultiModalVAE
(EncoderA/B/C + DecoderA/B/C) becomes fused Pallas kernels where each
encode→reparameterize→decode pass runs as a single on-chip matmul chain …
and losses.py's MSE + cross-entropy + β-warmup KL is fused with its backward
into one kernel." This kernel is that: the full train-mode forward over all
three encoders (arithmetic-mean posterior fusion of THREE Gaussians,
vae.py:64-71), all three decoders, the tri-modal loss
MSE-sum(RNA) + BCE-sum(DNA) + γ·weighted-CE-sum(site) + β·KLD
(losses.py:8-46) AND the hand-derived backward for all 28 parameter tensors
— one Mosaic kernel.

Cross-entropy backward with class weights + sum reduction:
  L_ce = Σ_i w[y_i]·(−log softmax(logits_i)[y_i])
  dlogits_i = w[y_i]·(softmax(logits_i) − onehot(y_i))
The class-weight gather becomes an MXU-trivial onehot·w product.

Equivalence vs ``jax.grad`` of an XLA reference forward with identical noise:
tests/test_pallas_multimodal.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_los_angeles_tpu.ops.nn import BN_EPS, BN_MOMENTUM
from vae_los_angeles_tpu.ops.pallas.fused_train import (
    DROPOUT_RATE,
    check_noise_args,
    _bn_train_bwd,
    _bn_train_fwd,
    _box_muller,
    _dot,
    _flatten_by,
    _interpret,
    _unflatten_by,
    _rand_uniform,
)

PARAM_ORDER_MM = [
    # EncoderA (RNA)
    ("a_w1", ("encoder_a", "fc", "w")),
    ("a_b1", ("encoder_a", "fc", "b")),
    ("a_gamma", ("encoder_a", "bn", "gamma")),
    ("a_beta", ("encoder_a", "bn", "beta")),
    ("a_wmu", ("encoder_a", "mu", "w")),
    ("a_bmu", ("encoder_a", "mu", "b")),
    ("a_wlv", ("encoder_a", "logvar", "w")),
    ("a_blv", ("encoder_a", "logvar", "b")),
    # EncoderB (DNA)
    ("b_w1", ("encoder_b", "fc1", "w")),
    ("b_b1", ("encoder_b", "fc1", "b")),
    ("b_gamma1", ("encoder_b", "bn1", "gamma")),
    ("b_beta1", ("encoder_b", "bn1", "beta")),
    ("b_w2", ("encoder_b", "fc2", "w")),
    ("b_b2", ("encoder_b", "fc2", "b")),
    ("b_gamma2", ("encoder_b", "bn2", "gamma")),
    ("b_beta2", ("encoder_b", "bn2", "beta")),
    ("b_wmu", ("encoder_b", "mu", "w")),
    ("b_bmu", ("encoder_b", "mu", "b")),
    ("b_wlv", ("encoder_b", "logvar", "w")),
    ("b_blv", ("encoder_b", "logvar", "b")),
    # EncoderC (site)
    ("emb", ("encoder_c", "embedding", "table")),
    ("c_wmu", ("encoder_c", "mu", "w")),
    ("c_bmu", ("encoder_c", "mu", "b")),
    ("c_wlv", ("encoder_c", "logvar", "w")),
    ("c_blv", ("encoder_c", "logvar", "b")),
    # DecoderA (RNA, linear head)
    ("da_w1", ("decoder_a", "fc1", "w")),
    ("da_b1", ("decoder_a", "fc1", "b")),
    ("da_w2", ("decoder_a", "fc2", "w")),
    ("da_b2", ("decoder_a", "fc2", "b")),
    # DecoderB (DNA, sigmoid head)
    ("db_w1", ("decoder_b", "fc1", "w")),
    ("db_b1", ("decoder_b", "fc1", "b")),
    ("db_w2", ("decoder_b", "fc2", "w")),
    ("db_b2", ("decoder_b", "fc2", "b")),
    ("db_w3", ("decoder_b", "fc3", "w")),
    ("db_b3", ("decoder_b", "fc3", "b")),
    # DecoderC (site logits)
    ("dc_w1", ("decoder_c", "fc1", "w")),
    ("dc_b1", ("decoder_c", "fc1", "b")),
    ("dc_w2", ("decoder_c", "fc2", "w")),
    ("dc_b2", ("decoder_c", "fc2", "b")),
]
N_MM = len(PARAM_ORDER_MM)


def _mm_kernel(*refs):
    (seed_ref, beta_ref, gamma_w_ref, use_prng_ref) = refs[:4]
    a_ref, b_ref, oh_ref, cw_row_ref = refs[4:8]  # cw_row: (B,) weight per sample
    eps_ref, dropa_ref, dropb1_ref, dropb2_ref = refs[8:12]
    p = refs[12 : 12 + N_MM]
    bn_in = refs[12 + N_MM : 12 + N_MM + 6]  # a_rm, a_rv, b_rm1, b_rv1, b_rm2, b_rv2
    outs = refs[12 + N_MM + 6 :]
    loss_ref = outs[0]
    g = outs[1 : 1 + N_MM]
    bn_out = outs[1 + N_MM :]

    (a_w1, a_b1, a_gamma, a_betap, a_wmu, a_bmu, a_wlv, a_blv,
     b_w1, b_b1, b_gamma1, b_beta1, b_w2, b_b2, b_gamma2, b_beta2,
     b_wmu, b_bmu, b_wlv, b_blv,
     emb, c_wmu, c_bmu, c_wlv, c_blv,
     da_w1, da_b1, da_w2, da_b2,
     db_w1, db_b1, db_w2, db_b2, db_w3, db_b3,
     dc_w1, dc_b1, dc_w2, dc_b2) = p

    pltpu.prng_seed(seed_ref[0])
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
    # stable log-softmax over the site logits
    zmax = jnp.max(logits_c, axis=1, keepdims=True)
    shifted = logits_c - zmax
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
    log_probs = shifted - lse
    # keep reductions 2-D (Mosaic rejects odd-shaped 1-D multi_reductions)
    w_row = cw_row_ref[:]  # (B, 1) class weight of each sample's label
    nll = -jnp.sum(log_probs * oh, axis=1, keepdims=True)  # (B, 1)
    ce = jnp.sum(w_row * nll)
    kld = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    loss_ref[0, 0] = mse + bce + gamma_w * ce + beta * kld

    unbias = batch / max(batch - 1, 1)
    bn_out[0][:] = (1.0 - BN_MOMENTUM) * bn_in[0][:] + BN_MOMENTUM * amu_b
    bn_out[1][:] = (1.0 - BN_MOMENTUM) * bn_in[1][:] + BN_MOMENTUM * avar_b * unbias
    bn_out[2][:] = (1.0 - BN_MOMENTUM) * bn_in[2][:] + BN_MOMENTUM * bmu_b1
    bn_out[3][:] = (1.0 - BN_MOMENTUM) * bn_in[3][:] + BN_MOMENTUM * bvar_b1 * unbias
    bn_out[4][:] = (1.0 - BN_MOMENTUM) * bn_in[4][:] + BN_MOMENTUM * bmu_b2
    bn_out[5][:] = (1.0 - BN_MOMENTUM) * bn_in[5][:] + BN_MOMENTUM * bvar_b2 * unbias

    # ---------------- backward ----------------
    (g_a_w1, g_a_b1, g_a_gamma, g_a_beta, g_a_wmu, g_a_bmu, g_a_wlv, g_a_blv,
     g_b_w1, g_b_b1, g_b_gamma1, g_b_beta1, g_b_w2, g_b_b2, g_b_gamma2,
     g_b_beta2, g_b_wmu, g_b_bmu, g_b_wlv, g_b_blv,
     g_emb, g_c_wmu, g_c_bmu, g_c_wlv, g_c_blv,
     g_da_w1, g_da_b1, g_da_w2, g_da_b2,
     g_db_w1, g_db_b1, g_db_w2, g_db_b2, g_db_w3, g_db_b3,
     g_dc_w1, g_dc_b1, g_dc_w2, g_dc_b2) = g

    # DecoderA backward (MSE)
    drecon_a = 2.0 * diff_a
    g_da_w2[:] = _dot(ra.T, drecon_a)
    g_da_b2[:] = jnp.sum(drecon_a, axis=0)
    dua = _dot(drecon_a, da_w2[:].T) * ma
    g_da_w1[:] = _dot(z.T, dua)
    g_da_b1[:] = jnp.sum(dua, axis=0)
    dz = _dot(dua, da_w1[:].T)

    # DecoderB backward (BCE with logits)
    dlogits_b = jax.nn.sigmoid(logits_b) - b
    g_db_w3[:] = _dot(rb2.T, dlogits_b)
    g_db_b3[:] = jnp.sum(dlogits_b, axis=0)
    dub2 = _dot(dlogits_b, db_w3[:].T) * mb2
    g_db_w2[:] = _dot(rb1.T, dub2)
    g_db_b2[:] = jnp.sum(dub2, axis=0)
    dub1 = _dot(dub2, db_w2[:].T) * mb1
    g_db_w1[:] = _dot(z.T, dub1)
    g_db_b1[:] = jnp.sum(dub1, axis=0)
    dz = dz + _dot(dub1, db_w1[:].T)

    # DecoderC backward (γ·weighted-CE): dlogits = γ·w_i·(softmax − onehot)
    softmax_c = jnp.exp(log_probs)
    dlogits_c = gamma_w * w_row * (softmax_c - oh)
    g_dc_w2[:] = _dot(rc.T, dlogits_c)
    g_dc_b2[:] = jnp.sum(dlogits_c, axis=0)
    duc = _dot(dlogits_c, dc_w2[:].T) * mc
    g_dc_w1[:] = _dot(z.T, duc)
    g_dc_b1[:] = jnp.sum(duc, axis=0)
    dz = dz + _dot(duc, dc_w1[:].T)

    # reparameterize + KL
    dmu = dz + beta * mu
    dlv = dz * eps * 0.5 * sigma + (-0.5 * beta) * (1.0 - jnp.exp(lv))
    dmu3 = third * dmu
    dlv3 = third * dlv

    # EncoderC backward
    g_c_wmu[:] = _dot(e.T, dmu3)
    g_c_bmu[:] = jnp.sum(dmu3, axis=0)
    g_c_wlv[:] = _dot(e.T, dlv3)
    g_c_blv[:] = jnp.sum(dlv3, axis=0)
    de = _dot(dmu3, c_wmu[:].T) + _dot(dlv3, c_wlv[:].T)
    g_emb[:] = _dot(oh.T, de)

    # EncoderA backward
    g_a_wmu[:] = _dot(ad.T, dmu3)
    g_a_bmu[:] = jnp.sum(dmu3, axis=0)
    g_a_wlv[:] = _dot(ad.T, dlv3)
    g_a_blv[:] = jnp.sum(dlv3, axis=0)
    dad = _dot(dmu3, a_wmu[:].T) + _dot(dlv3, a_wlv[:].T)
    dah = dad * adrop / keep * armask
    da1_, dgam_a, dbeta_a = _bn_train_bwd(dah, axhat, ainv, a_gamma[:])
    g_a_gamma[:] = dgam_a
    g_a_beta[:] = dbeta_a
    g_a_w1[:] = _dot(a.T, da1_)
    g_a_b1[:] = jnp.sum(da1_, axis=0)

    # EncoderB backward
    g_b_wmu[:] = _dot(bd2.T, dmu3)
    g_b_bmu[:] = jnp.sum(dmu3, axis=0)
    g_b_wlv[:] = _dot(bd2.T, dlv3)
    g_b_blv[:] = jnp.sum(dlv3, axis=0)
    dbd2 = _dot(dmu3, b_wmu[:].T) + _dot(dlv3, b_wlv[:].T)
    dbh2 = dbd2 * bdrop2 / keep * brmask2
    dba2, dgam_b2, dbeta_b2 = _bn_train_bwd(dbh2, bxhat2, binv2, b_gamma2[:])
    g_b_gamma2[:] = dgam_b2
    g_b_beta2[:] = dbeta_b2
    g_b_w2[:] = _dot(bd1.T, dba2)
    g_b_b2[:] = jnp.sum(dba2, axis=0)
    dbd1 = _dot(dba2, b_w2[:].T)
    dbh1 = dbd1 * bdrop1 / keep * brmask1
    dba1, dgam_b1, dbeta_b1 = _bn_train_bwd(dbh1, bxhat1, binv1, b_gamma1[:])
    g_b_gamma1[:] = dgam_b1
    g_b_beta1[:] = dbeta_b1
    g_b_w1[:] = _dot(b.T, dba1)
    g_b_b1[:] = jnp.sum(dba1, axis=0)


@functools.partial(jax.jit, static_argnames=("use_prng",))
def _mm_call(flat_params, bn_list, a, b, oh, cw_row, eps_in, dropa, dropb1,
             dropb2, seed, beta, gamma_w, use_prng: bool):
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        + [
            jax.ShapeDtypeStruct(flat_params[k].shape, jnp.float32)
            for k, _ in PARAM_ORDER_MM
        ]
        + [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in bn_list]
    )
    out_specs = tuple(
        [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * (N_MM + 6)
    )
    outs = pl.pallas_call(
        _mm_kernel,
        out_shape=tuple(out_shape),
        in_specs=[smem()] * 4
        + [vmem()] * 8
        + [vmem()] * N_MM
        + [vmem()] * 6,
        out_specs=out_specs,
        interpret=_interpret(),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([gamma_w], jnp.float32),
        jnp.asarray([1 if use_prng else 0], jnp.int32),
        a, b, oh, cw_row, eps_in, dropa, dropb1, dropb2,
        *[flat_params[k] for k, _ in PARAM_ORDER_MM],
        *bn_list,
    )
    loss = outs[0][0, 0]
    grads = {k: outs[1 + i] for i, (k, _) in enumerate(PARAM_ORDER_MM)}
    return loss, grads, outs[1 + N_MM :]


def _flatten_mm(params):
    return _flatten_by(params, PARAM_ORDER_MM)


def _unflatten_mm(flat):
    return _unflatten_by(flat, PARAM_ORDER_MM)


def multimodal_fused_train_step(
    params, state, a, b, site, n_sites, *, seed=0, beta=1e-3, gamma=1.0,
    class_weights=None, eps=None, drop_a=None, drop_b1=None, drop_b2=None,
):
    """One fused tri-modal train step: (loss, grads_pytree, new_state)."""
    flat = _flatten_mm(params)
    site = jnp.asarray(site)
    onehot = jax.nn.one_hot(site, n_sites, dtype=jnp.float32)
    if class_weights is None:
        cw_row = jnp.ones((a.shape[0], 1), jnp.float32)
    else:
        cw_row = jnp.take(jnp.asarray(class_weights, jnp.float32), site)[:, None]
    use_prng = check_noise_args(
        eps=eps, drop_a=drop_a, drop_b1=drop_b1, drop_b2=drop_b2
    )
    batch = a.shape[0]
    latent = flat["a_wmu"].shape[1]
    if eps is None:
        eps = jnp.zeros((batch, latent), jnp.float32)
    if drop_a is None:
        drop_a = jnp.ones((batch, flat["a_w1"].shape[1]), jnp.float32)
    if drop_b1 is None:
        drop_b1 = jnp.ones((batch, flat["b_w1"].shape[1]), jnp.float32)
    if drop_b2 is None:
        drop_b2 = jnp.ones((batch, flat["b_w2"].shape[1]), jnp.float32)
    bn_list = [
        state["encoder_a"]["bn"]["mean"], state["encoder_a"]["bn"]["var"],
        state["encoder_b"]["bn1"]["mean"], state["encoder_b"]["bn1"]["var"],
        state["encoder_b"]["bn2"]["mean"], state["encoder_b"]["bn2"]["var"],
    ]
    loss, grads_flat, bn_out = _mm_call(
        flat, bn_list,
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32), onehot, cw_row,
        jnp.asarray(eps, jnp.float32), jnp.asarray(drop_a, jnp.float32),
        jnp.asarray(drop_b1, jnp.float32), jnp.asarray(drop_b2, jnp.float32),
        seed, beta, gamma, use_prng,
    )
    new_state = {
        "encoder_a": {"bn": {"mean": bn_out[0], "var": bn_out[1]}},
        "encoder_b": {
            "bn1": {"mean": bn_out[2], "var": bn_out[3]},
            "bn2": {"mean": bn_out[4], "var": bn_out[5]},
        },
    }
    return loss, _unflatten_mm(grads_flat), new_state
