"""Equivalence tests for the fused wide-output-layer kernel
(ops/pallas/fused_wide.py) against the XLA path it replaces: jax.grad of
the stable BCE-with-logits sum + ops.optim.adamw_update. Runs in interpret
mode on CPU (the kernel is deterministic — no PRNG — so interpret-mode
equality IS hardware equality up to fp32 reduction order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.ops import optim
from vae_los_angeles_tpu.ops.losses import bce_with_logits_sum
from vae_los_angeles_tpu.ops.pallas.fused_wide import fused_wide_output_step


def _xla_reference(h, target, w, b, m_w, v_w, m_b, v_b, step, lr, wd):
    def loss_fn(params, h):
        logits = h @ params["w"] + params["b"]
        return bce_with_logits_sum(logits, target)

    params = {"w": w, "b": b}
    (loss, (grads, dh)) = (
        lambda out: (out[0], out[1])
    )(jax.value_and_grad(loss_fn, argnums=(0, 1))(params, h))
    opt = {"step": step, "m": {"w": m_w, "b": m_b}, "v": {"w": v_w, "b": v_b}}
    new_params, new_opt = optim.adamw_update(
        params, grads, opt, lr, wd
    )
    return (
        new_params["w"], new_params["b"],
        new_opt["m"]["w"], new_opt["v"]["w"],
        new_opt["m"]["b"], new_opt["v"]["b"],
        new_opt["step"], dh, loss,
    )


def _inputs(n, d_in, D, seed=0, steps_done=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(n, d_in)), jnp.float32)
    target = jnp.asarray(rng.random((n, D)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.05, size=(d_in, D)), jnp.float32)
    b = jnp.asarray(rng.normal(scale=0.05, size=(D,)), jnp.float32)
    m_w = jnp.asarray(rng.normal(scale=0.01, size=(d_in, D)), jnp.float32)
    v_w = jnp.asarray(rng.random((d_in, D)) * 1e-4, jnp.float32)
    m_b = jnp.asarray(rng.normal(scale=0.01, size=(D,)), jnp.float32)
    v_b = jnp.asarray(rng.random((D,)) * 1e-4, jnp.float32)
    return h, target, w, b, m_w, v_w, m_b, v_b, jnp.int32(steps_done)


@pytest.mark.parametrize("D,block_cols", [(384, 128), (300, 128)])
def test_fused_wide_step_matches_xla(D, block_cols):
    """Full-block and padded-tail widths: every output (updated w/b, all four
    moments, step, dh, loss) must match jax.grad + adamw_update."""
    n, d_in = 16, 8
    *args, step = _inputs(n, d_in, D)
    lr, wd = jnp.float32(1e-3), jnp.float32(1e-2)
    got = fused_wide_output_step(*args, step, lr, wd, block_cols=block_cols)
    want = _xla_reference(*args, step, lr, wd)
    names = ["w", "b", "m_w", "v_w", "m_b", "v_b", "step", "dh", "loss"]
    for name, g, e in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), rtol=2e-5, atol=2e-6,
            err_msg=f"{name} mismatch (D={D}, block={block_cols})",
        )


def test_fused_wide_step_chains():
    """Three chained steps (state threaded through) track the XLA chain —
    the bias-correction step count and moment accumulation stay in sync."""
    n, d_in, D = 8, 8, 256
    h, target, w, b, m_w, v_w, m_b, v_b, step = _inputs(n, d_in, D, seed=3)
    lr, wd = jnp.float32(5e-4), jnp.float32(1e-4)
    state_k = (w, b, m_w, v_w, m_b, v_b, step)
    state_x = state_k
    for i in range(3):
        out_k = fused_wide_output_step(
            h, target, *state_k, lr, wd, block_cols=128
        )
        out_x = _xla_reference(h, target, *state_x, lr, wd)
        state_k = out_k[:7]
        state_x = out_x[:7]
        np.testing.assert_allclose(
            np.asarray(out_k[8]), np.asarray(out_x[8]), rtol=1e-5,
            err_msg=f"loss diverged at chained step {i}",
        )
    for g, e in zip(state_k, state_x):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), rtol=5e-5, atol=5e-6
        )
    assert int(state_k[6]) == 3


def test_fused_wide_padded_tail_stays_zero():
    """With D not a block multiple, the padded columns must not leak into
    any output — and a zero-initialized padded region of the returned
    (unpadded) arrays is definitionally absent."""
    n, d_in, D = 8, 8, 200  # pads to 256
    args = _inputs(n, d_in, D, seed=5)
    out = fused_wide_output_step(
        *args, jnp.float32(1e-3), jnp.float32(0.0), block_cols=128
    )
    assert out[0].shape == (d_in, D)
    assert out[1].shape == (D,)
    # the loss must equal the valid-column BCE exactly (no 0.5-sigmoid
    # pollution from padded logits)
    h, target, w, b = args[0], args[1], args[2], args[3]
    want = float(bce_with_logits_sum(h @ w + b, target))
    np.testing.assert_allclose(float(out[8]), want, rtol=1e-6)
