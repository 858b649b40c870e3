"""Fused forward + backward + AdamW for a WIDE sigmoid/BCE output layer.

The opposite-regime counterpart of the whole-epoch megakernels (VERDICT r2
#6): at whole-methylome width (dim_b ≈ 450k) a train step is bound by the
HBM sweep of the output layer's params + optimizer state
(benchmarks/RESULTS.md scale demo #2 — the 512×450k weight is 0.92 GB fp32,
and XLA's step reads the weight for the forward, reads it again for the
backward, WRITES a weight-sized gradient, then the optimizer re-reads
w/m/v/grad and writes w/m/v: ~6 weight-sized HBM passes plus the logits
round-trip).

This kernel makes the whole output layer — logits = h @ W + b, the
sum-reduced BCE-with-logits loss, dL/dW, dL/db, dL/dh AND the AdamW update
of (W, b, m, v) — ONE column-block sweep: each (d_in × block) weight column
block and its moments are read once, updated in VMEM, written once. The
gradient never exists in HBM. Per step the wide-layer traffic drops from
~6 weight-sweeps + logits to 3 reads (w, m, v) + 3 writes + the target
block — the same read-modify-write fusion the small-dims megakernel applies
to the whole model, applied to the one tensor that dominates this regime.

Semantics are exactly the XLA path's:
  * BCE: sum(max(l,0) − l·t + log1p(e^−|l|)) (ops/losses.bce_with_logits_sum)
  * AdamW: torch order — decoupled decay FIRST, then the bias-corrected
    moment step (ops/optim.adamw_update)
  * dL/dh uses the PRE-update weights.
Equivalence-tested against jax.grad + optim.adamw_update in
tests/test_pallas_wide.py (bit-tolerance fp32, including the padded tail
when the width is not a block multiple).

The backward-through-trunk contract: the returned ``dh`` feeds the upstream
(narrow) layers' XLA backward, so this composes as "XLA trunk + fused wide
head" (benchmarks/bench_fused_wide.py measures the head, which IS the
regime's cost).

MEASURED ANTI-RESULT (round 3, real v5e — kept in-tree as the documented
prototype, NOT a production path): at dim=450k the kernel runs 43.1 ms/step
(batch 32) and 46.4 ms (batch 256) vs XLA's 12.6/13.7 ms — 0.29×. Analysis
in benchmarks/RESULTS.md: XLA already executes this regime at ~90% of HBM
peak for its ~9.2 GB/step traffic, so eliminating the gradient round-trip
bounds the win at ~1.85×; and the Mosaic kernel is per-BLOCK compute-bound
(fp32 MXU at M=batch≤256 utilization plus the VPU AdamW sweep per block,
~98 µs per 1024-column block where pure DMA would be ~31 µs), which Mosaic's
pipeline cannot hide at these shapes. The megakernel rationale does NOT
transfer to the wide regime: there, fusion removes per-STEP HBM sweeps of
state that XLA re-reads every step; here XLA's own fusion already avoids all
but one params+moments sweep, and that sweep is irreducible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_los_angeles_tpu.ops.optim import ADAM_B1, ADAM_B2, ADAM_EPS
from vae_los_angeles_tpu.ops.pallas.fused_vae import (
    _dot,
    _interpret,
    scoped_vmem_limit,
)


def _adamw_leaf(p, g, m, v, lr, wd, bc1, bc2):
    """ops/optim.adamw_update's leaf, verbatim (torch decay-first order)."""
    m = ADAM_B1 * m + (1.0 - ADAM_B1) * g
    v = ADAM_B2 * v + (1.0 - ADAM_B2) * jnp.square(g)
    p = p * (1.0 - lr * wd)
    p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
    return p, m, v


def _kernel(d_valid, block_cols,
            scalars_ref, h_ref, t_ref, w_ref, b_ref, mw_ref, vw_ref,
            mb_ref, vb_ref,
            new_w_ref, new_b_ref, new_mw_ref, new_vw_ref, new_mb_ref,
            new_vb_ref, dh_ref, loss_ref):
    j = pl.program_id(0)
    # bias corrections are computed host-side (Mosaic has no powf with a
    # traced exponent) and shipped through SMEM
    bc1 = scalars_ref[0, 0]
    bc2 = scalars_ref[0, 1]
    lr = scalars_ref[0, 2]
    wd = scalars_ref[0, 3]

    h = h_ref[:]          # (n, d_in) — resident across the whole sweep
    w = w_ref[:]          # (d_in, blk)
    b = b_ref[:]          # (1, blk)
    t = t_ref[:]          # (n, blk)

    # columns beyond the true width are zero-padding: mask their loss and
    # gradient so the padded tail stays exactly zero through the update
    col = j * block_cols + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_cols), 1
    )
    valid = (col < d_valid).astype(jnp.float32)  # (1, blk)

    logits = _dot(h, w) + b
    # stable BCE-with-logits, summed over the valid columns
    bce = (
        jnp.maximum(logits, 0.0)
        - logits * t
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ) * valid

    @pl.when(j == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        loss_ref[:] = jnp.zeros_like(loss_ref)

    # full-block store: Mosaic cannot store scalars to VMEM, so the (1,1)
    # accumulator is updated as a block
    loss_ref[:] = loss_ref[:] + jnp.sum(bce)

    dy = (jax.nn.sigmoid(logits) - t) * valid     # d(BCE_sum)/dlogits
    # dot_general with explicit contraction dims rather than an in-kernel
    # .T (a lane/sublane shuffle of the whole block per grid step) — on the
    # 450k bench this was measured neutral (the kernel is bound elsewhere,
    # see the module anti-result), but it is never worse
    grad_w = jax.lax.dot_general(                 # hᵀ @ dy → (d_in, blk)
        h, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    grad_b = jnp.sum(dy, axis=0, keepdims=True)   # (1, blk)
    dh_ref[:] += jax.lax.dot_general(             # dy @ wᵀ → (n, d_in)
        dy, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # pre-update weights

    new_w, new_mw, new_vw = _adamw_leaf(
        w, grad_w, mw_ref[:], vw_ref[:], lr, wd, bc1, bc2
    )
    new_b, new_mb, new_vb = _adamw_leaf(
        b, grad_b, mb_ref[:], vb_ref[:], lr, wd, bc1, bc2
    )
    new_w_ref[:] = new_w
    new_mw_ref[:] = new_mw
    new_vw_ref[:] = new_vw
    new_b_ref[:] = new_b
    new_mb_ref[:] = new_mb
    new_vb_ref[:] = new_vb


@functools.partial(
    jax.jit, static_argnames=("block_cols",)
)
def fused_wide_output_step(h, target, w, b, m_w, v_w, m_b, v_b,
                           step, lr, weight_decay, *, block_cols=1024):
    """One fused train step of the wide output layer.

    Args:
      h: (n, d_in) fp32 trunk activations (the layer's input).
      target: (n, D) fp32 targets in [0, 1].
      w, m_w, v_w: (d_in, D) weight and its AdamW moments.
      b, m_b, v_b: (D,) bias and moments.
      step: int32 step count BEFORE this update (bias correction uses
        step+1, like optim.adamw_update).
      lr, weight_decay: traced fp32 scalars.
      block_cols: column-block width (multiple of 128). D is zero-padded to
        a block multiple internally; the padded tail provably stays zero.

    Returns (new_w, new_b, new_m_w, new_v_w, new_m_b, new_v_b, new_step,
    dh, loss_sum).
    """
    n, d_in = h.shape
    D = w.shape[1]
    if D % block_cols:
        pad = block_cols - D % block_cols
        padw = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        w, m_w, v_w = padw(w), padw(m_w), padw(v_w)
        target = padw(target)
        pad1 = lambda x: jnp.pad(x, (0, pad))
        b, m_b, v_b = pad1(b), pad1(m_b), pad1(v_b)
    Dp = w.shape[1]
    grid = Dp // block_cols

    as_row = lambda x: x.reshape(1, Dp)
    b2, mb2, vb2 = as_row(b), as_row(m_b), as_row(v_b)
    new_step = step + 1
    t = new_step.astype(jnp.float32)
    scalars = jnp.stack(
        [1.0 - ADAM_B1 ** t, 1.0 - ADAM_B2 ** t, lr, weight_decay]
    ).reshape(1, 4)

    f32 = jnp.float32
    wide = lambda: pl.BlockSpec((d_in, block_cols), lambda j: (0, j))
    row = lambda: pl.BlockSpec((1, block_cols), lambda j: (0, j))
    batch_blk = lambda: pl.BlockSpec((n, block_cols), lambda j: (0, j))
    const = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0))

    outs = pl.pallas_call(
        functools.partial(_kernel, D, block_cols),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            const((n, d_in)),   # h
            batch_blk(),        # target
            wide(),             # w
            row(),              # b
            wide(),             # m_w
            wide(),             # v_w
            row(),              # m_b
            row(),              # v_b
        ],
        out_specs=(
            wide(), row(), wide(), wide(), row(), row(),
            const((n, d_in)),   # dh (accumulated across blocks)
            pl.BlockSpec((1, 1), lambda j: (0, 0)),  # loss accumulator
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d_in, Dp), f32),
            jax.ShapeDtypeStruct((1, Dp), f32),
            jax.ShapeDtypeStruct((d_in, Dp), f32),
            jax.ShapeDtypeStruct((d_in, Dp), f32),
            jax.ShapeDtypeStruct((1, Dp), f32),
            jax.ShapeDtypeStruct((1, Dp), f32),
            jax.ShapeDtypeStruct((n, d_in), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scoped_vmem_limit(),
        ),
    )(scalars, h, target, w, b2, m_w, v_w, mb2, vb2)

    new_w, new_b, new_mw, new_vw, new_mb, new_vb, dh, loss = outs
    unpad = lambda x: x[:, :D] if Dp != D else x
    return (
        unpad(new_w), unpad(new_b)[0], unpad(new_mw), unpad(new_vw),
        unpad(new_mb)[0], unpad(new_vb)[0], new_step, dh, loss[0, 0],
    )
