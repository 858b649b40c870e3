"""Optimizer + scheduler state machines as pure functions.

Hand-rolled (rather than optax) for two reasons:
  1. the learning rate must be a *traced* carry value so that torch's
     ReduceLROnPlateau semantics (reference train_rna2dna.py:190-195) can run
     entirely inside the fused `lax.scan` training loop, and
  2. hyperparameters (lr, weight-decay, beta1/2) stay plain scalars, so a
     population of HPO trials vmaps over them with zero ceremony
     (`parallel/vmap_meta.py`).

AdamW replicates ``torch.optim.AdamW`` exactly (decoupled decay applied
multiplicatively BEFORE the Adam update; bias-corrected moments; eps added
after sqrt). Defaults betas=(0.9,0.999), eps=1e-8
(reference train_rna2dna.py:185-189 uses lr=5e-4, weight_decay=1e-5).

The plateau scheduler replicates torch defaults: mode='min',
threshold=1e-4 (relative), cooldown=0, min_lr=0 — LR is multiplied by
``factor`` when the monitored value fails to improve for > ``patience``
consecutive epochs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8
PLATEAU_THRESHOLD = 1e-4  # torch default, threshold_mode='rel'


def adamw_init(params, moments_dtype=None):
    """Fresh AdamW state.

    ``moments_dtype`` (e.g. ``jnp.bfloat16``) stores the m/v moment tensors
    reduced — the wide-regime bandwidth knob: each step sweeps
    params+moments through HBM, and at whole-methylome width that sweep IS
    the step time (benchmarks/RESULTS.md scale demo #2), so halving the
    moment bytes cuts it ~1/3. Updates are always COMPUTED in fp32
    (``adamw_update`` upcasts, then rounds back to storage dtype); None
    keeps full-fp32 moments — bit-identical to the torch-parity recipe."""
    def zeros(p):
        # zeros_like (not zeros): committed/sharded params pass their
        # sharding to the moments, which plain jnp.zeros would drop
        return jnp.zeros_like(p, dtype=moments_dtype or p.dtype)

    return {
        "step": jnp.zeros((), jnp.int32),
        "m": jax.tree.map(zeros, params),
        "v": jax.tree.map(zeros, params),
    }


def adamw_update(params, grads, state, lr, weight_decay):
    """One AdamW step. ``lr`` may be a traced scalar (plateau-scheduled).

    Moments may be stored reduced (see ``adamw_init``): math runs in fp32
    and results round back to each leaf's storage dtype — an exact identity
    when the storage is fp32, so the default path stays bit-compatible."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1**t
    bc2 = 1.0 - ADAM_B2**t

    def leaf(p, g, m, v):
        mdt, vdt = m.dtype, v.dtype
        m = ADAM_B1 * m.astype(jnp.float32) + (1.0 - ADAM_B1) * g
        v = ADAM_B2 * v.astype(jnp.float32) + (1.0 - ADAM_B2) * jnp.square(g)
        # torch order: decay p first, then apply bias-corrected Adam step.
        p = p * (1.0 - lr * weight_decay)
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
        return p, m.astype(mdt), v.astype(vdt)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    out = [leaf(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"step": step, "m": new_m, "v": new_v}


def adam_update(params, grads, state, lr, weight_decay=0.0):
    """Plain Adam with torch's *coupled* L2 weight decay (grad += wd*p before
    the moment updates) — matches ``torch.optim.Adam(weight_decay=...)`` used
    by the downstream classifiers (reference downstream_task.py:84)."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1**t
    bc2 = 1.0 - ADAM_B2**t

    def leaf(p, g, m, v):
        g = g + weight_decay * p
        m = ADAM_B1 * m + (1.0 - ADAM_B1) * g
        v = ADAM_B2 * v + (1.0 - ADAM_B2) * jnp.square(g)
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
        return p, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    out = [leaf(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    return (
        treedef.unflatten([o[0] for o in out]),
        {
            "step": step,
            "m": treedef.unflatten([o[1] for o in out]),
            "v": treedef.unflatten([o[2] for o in out]),
        },
    )


# ---------------------------------------------------------------------------
# Adafactor (Shazeer & Stern 2018): factored second moments
# ---------------------------------------------------------------------------

ADAFACTOR_EPS1 = 1e-30
ADAFACTOR_CLIP = 1.0
ADAFACTOR_DECAY = -0.8


def adafactor_init(params, moments_dtype=None):
    """Adafactor state: for an (r, c) matrix the second-moment statistics are
    one row vector (r,) and one column vector (c,) instead of an (r, c)
    tensor — and there is no first moment at all (T5-style, ``beta1=None``).

    THE wide-regime optimizer: the whole-methylome AdamW step is bound by
    sweeping params+m+v (3×weights) through HBM; Adafactor's sweep is params
    only (~3× fewer bytes), with update quality carried by the factored
    variance approximation + update clipping. Semantics match
    ``transformers.optimization.Adafactor(scale_parameter=False,
    relative_step=False, beta1=None)`` — the recommended external-lr
    configuration — and are locked against that live oracle in
    tests/test_optim.py. 1-D leaves (biases, BN) keep full second moments
    (they are tiny). ``moments_dtype`` optionally stores the (already tiny)
    statistics reduced, composing with MOMENTS_DTYPE."""
    dt = moments_dtype or jnp.float32

    def row(p):  # factored row stats; doubles as the FULL moment for <2-D
        shape = p.shape[:-1] if p.ndim >= 2 else p.shape
        return jnp.zeros(shape, dt)

    def col(p):  # factored col stats; zero-size placeholder for <2-D
        shape = p.shape[:-2] + p.shape[-1:] if p.ndim >= 2 else (0,)
        return jnp.zeros(shape, dt)

    return {
        "step": jnp.zeros((), jnp.int32),
        "vr": jax.tree.map(row, params),
        "vc": jax.tree.map(col, params),
    }


def adafactor_update(params, grads, state, lr, weight_decay):
    """One Adafactor step (external ``lr`` may be a traced scalar, so the
    plateau scheduler composes exactly as with AdamW).

    Per HF/fairseq reference: beta2t = 1 - step^-0.8; factored leaves update
    row/col means of g²+eps1 and approximate rsqrt(v) as
    rsqrt(row/mean(row)) ⊗ rsqrt(col); the update is RMS-clipped to 1.0,
    lr-scaled, and applied after decoupled weight decay. Math in fp32;
    statistics round back to their storage dtype."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    beta2t = 1.0 - t**ADAFACTOR_DECAY

    def leaf(p, g, vr, vc):
        vrdt, vcdt = vr.dtype, vc.dtype
        u = jnp.square(g) + ADAFACTOR_EPS1
        if p.ndim >= 2:
            vr = beta2t * vr.astype(jnp.float32) + (1.0 - beta2t) * u.mean(-1)
            vc = beta2t * vc.astype(jnp.float32) + (1.0 - beta2t) * u.mean(-2)
            r = jax.lax.rsqrt(vr / vr.mean(-1, keepdims=True))
            c = jax.lax.rsqrt(vc)
            upd = r[..., :, None] * c[..., None, :] * g
        else:
            vr = beta2t * vr.astype(jnp.float32) + (1.0 - beta2t) * u
            upd = jax.lax.rsqrt(vr) * g
        rms = jnp.sqrt(jnp.mean(jnp.square(upd)))
        upd = upd / jnp.maximum(1.0, rms / ADAFACTOR_CLIP)
        # HF order: p += -wd*lr*p, then p -= lr*update  ==  decoupled decay
        p = p * (1.0 - lr * weight_decay)
        p = p - lr * upd
        return p, vr.astype(vrdt), vc.astype(vcdt)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_vr = treedef.flatten_up_to(state["vr"])
    flat_vc = treedef.flatten_up_to(state["vc"])
    out = [leaf(p, g, vr, vc)
           for p, g, vr, vc in zip(flat_p, flat_g, flat_vr, flat_vc)]
    return (
        treedef.unflatten([o[0] for o in out]),
        {
            "step": step,
            "vr": treedef.unflatten([o[1] for o in out]),
            "vc": treedef.unflatten([o[2] for o in out]),
        },
    )


# (init, update) pairs the training layers select from via Config.optimizer
OPTIMIZERS = {
    "adamw": (adamw_init, adamw_update),  # torch-parity default
    "adafactor": (adafactor_init, adafactor_update),  # wide-regime choice
}


# ---------------------------------------------------------------------------
# ReduceLROnPlateau (min mode) as a scan-friendly state transition
# ---------------------------------------------------------------------------


def plateau_init(lr):
    return {
        "lr": jnp.asarray(lr, jnp.float32),
        "best": jnp.asarray(jnp.inf, jnp.float32),
        "bad_epochs": jnp.zeros((), jnp.int32),
    }


def plateau_step(state, metric, factor, patience):
    """Returns updated state; state['lr'] is the LR for the NEXT epoch."""
    improved = metric < state["best"] * (1.0 - PLATEAU_THRESHOLD)
    best = jnp.where(improved, metric, state["best"])
    bad = jnp.where(improved, 0, state["bad_epochs"] + 1)
    reduce_now = bad > patience
    lr = jnp.where(reduce_now, state["lr"] * factor, state["lr"])
    bad = jnp.where(reduce_now, 0, bad)
    return {"lr": lr, "best": best, "bad_epochs": bad}


# ---------------------------------------------------------------------------
# Early stopping (strict-improvement, reference train_rna2dna.py:225-237)
# ---------------------------------------------------------------------------


def early_stop_init():
    return {
        "best_val": jnp.asarray(jnp.inf, jnp.float32),
        "trigger": jnp.zeros((), jnp.int32),
        "stopped": jnp.zeros((), jnp.bool_),
        "best_epoch": jnp.zeros((), jnp.int32),
    }


def early_stop_step(state, val_loss, epoch, patience):
    """Returns (new_state, take_snapshot) — snapshot is True on improvement
    (the fused trainer then copies current params into best-params slots)."""
    improved = jnp.logical_and(val_loss < state["best_val"], ~state["stopped"])
    best_val = jnp.where(improved, val_loss, state["best_val"])
    trigger = jnp.where(improved, 0, state["trigger"] + 1)
    stopped = jnp.logical_or(state["stopped"], trigger >= patience)
    best_epoch = jnp.where(improved, epoch, state["best_epoch"])
    return (
        {
            "best_val": best_val,
            "trigger": trigger,
            "stopped": stopped,
            "best_epoch": best_epoch,
        },
        improved,
    )
