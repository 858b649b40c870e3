#!/usr/bin/env python
"""Fused wide-output-layer kernel vs the XLA path — the VERDICT r2 #6
measurement: at whole-methylome width (dim_b≈450k) the train step is bound
by the HBM sweep of the output layer's params + AdamW state (RESULTS.md
scale demo #2). ``ops/pallas/fused_wide.py`` fuses forward + backward +
AdamW into one read-modify-write sweep of the 0.92 GB weight; this script
measures both implementations of the SAME computation (logits, BCE-sum
loss, dL/dh, full AdamW update of W and b) on the real chip:

    python benchmarks/bench_fused_wide.py --dim 450000 --batch 32
    python benchmarks/bench_fused_wide.py --dim 450000 --batch 256

Both paths donate the state buffers (in-place updates — the wide regime
cannot afford double-buffered 5.5 GB). Timing fetches the loss per step
batch (axon relay: block_until_ready lies; device_get doesn't).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=450_000)
    ap.add_argument("--d_in", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--block_cols", type=int, default=1024)
    ap.add_argument("--paths", nargs="+", default=["xla", "fused"],
                    choices=["xla", "fused"])
    args = ap.parse_args()

    from vae_los_angeles_tpu.ops import optim
    from vae_los_angeles_tpu.ops.losses import bce_with_logits_sum
    from vae_los_angeles_tpu.ops.pallas.fused_wide import fused_wide_output_step

    print(f"devices: {jax.devices()}")
    n, d_in, D = args.batch, args.d_in, args.dim
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(n, d_in)), jnp.float32)
    target = jnp.asarray(rng.random((n, D)), jnp.float32)

    def fresh_state():
        w = jnp.asarray(
            rng.normal(scale=0.02, size=(d_in, D)), jnp.float32
        )
        b = jnp.zeros((D,), jnp.float32)
        return (w, b, jnp.zeros_like(w), jnp.zeros_like(w),
                jnp.zeros_like(b), jnp.zeros_like(b), jnp.int32(0))

    lr, wd = jnp.float32(5e-4), jnp.float32(1e-5)

    # --- XLA path: jax.grad of the identical computation + adamw_update,
    # with state donation (in-place) for a fair bandwidth comparison
    def xla_step(w, b, m_w, v_w, m_b, v_b, step, h, target, lr, wd):
        def loss_fn(params, h):
            return bce_with_logits_sum(h @ params["w"] + params["b"], target)

        params = {"w": w, "b": b}
        loss, (grads, dh) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, h
        )
        opt = {"step": step, "m": {"w": m_w, "b": m_b},
               "v": {"w": v_w, "b": v_b}}
        new_params, new_opt = optim.adamw_update(params, grads, opt, lr, wd)
        return (new_params["w"], new_params["b"], new_opt["m"]["w"],
                new_opt["v"]["w"], new_opt["m"]["b"], new_opt["v"]["b"],
                new_opt["step"], dh, loss)

    xla_jit = jax.jit(xla_step, donate_argnums=(0, 1, 2, 3, 4, 5))
    # h/target must be ARGUMENTS, not closure captures — a captured device
    # array is baked into the program as a constant, which on the relay
    # ships the whole (n, 450k) target inside the compile request (HTTP 413
    # at batch 256) and defeats donation
    fused_jit = jax.jit(
        lambda h_, t_, *s: fused_wide_output_step(
            h_, t_, *s, lr, wd, block_cols=args.block_cols
        ),
        donate_argnums=tuple(range(2, 8)),
    )

    state_bytes = (d_in * D * 3 + D * 3) * 4
    print(f"dim={D} d_in={d_in} batch={n}: params+moments = "
          f"{state_bytes / 1e9:.2f} GB swept per step")

    results = {}
    for name in args.paths:
        state = fresh_state()
        step_fn = (
            (lambda s: xla_jit(*s, h, target, lr, wd))
            if name == "xla" else (lambda s: fused_jit(h, target, *s))
        )
        t0 = time.perf_counter()
        out = step_fn(state)
        loss0 = float(jax.device_get(out[8]))
        compile_s = time.perf_counter() - t0
        state = out[:7]
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = step_fn(state)
            state = out[:7]
        loss = float(jax.device_get(out[8]))
        steady = (time.perf_counter() - t0) / args.steps
        eff_bw = state_bytes * 2 / steady / 1e9  # 1 read + 1 write sweep
        results[name] = steady
        print(
            f"{name:>6}: {steady * 1e3:8.2f} ms/step "
            f"(compile+first {compile_s:.1f}s, loss {loss0:.1f}->{loss:.1f}, "
            f"RMW-sweep effective {eff_bw:.0f} GB/s)"
        )
    if len(results) == 2:
        print(f"fused speedup vs XLA: {results['xla'] / results['fused']:.2f}x")


if __name__ == "__main__":
    main()
