#!/usr/bin/env python
"""Measure Pallas-megakernel × vmap for the CV/HPO meta-loops (VERDICT #6).

The fold/trial populations (`parallel/vmap_meta.py`) historically always
built the XLA-path fit. This experiment vmaps the whole-epoch Pallas
megakernel over a trial population and compares against the vmapped XLA
path on the real chip:

    python benchmarks/bench_vmap_pallas.py [--pop 4] [--epochs 50] [--n 2000]

Prints compile time and steady-state wall for each path; the decision is
recorded in RESULTS.md and in a code comment at vmap_meta._vmapped_fit.
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

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--dim_a", type=int, default=1177)
    ap.add_argument("--dim_b", type=int, default=1211)
    ap.add_argument("--unroll", type=int, default=0,
                    help="override engine._batch_unroll (0 = leave default)")
    args = ap.parse_args()

    if args.unroll:
        engine._batch_unroll_override = args.unroll
        # distinct lru/jit cache keys per unroll are NOT in the fit key —
        # clear so the override actually takes effect
        engine.build_fit_fn.cache_clear()

    cfg = Config(
        input_dim_a=args.dim_a, input_dim_b=args.dim_b, latent_dim=20,
        batch_size=32, patience=10**6,
    )
    n_sites = 24
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=args.n, dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b,
        n_sites=n_sites, seed=0,
    )
    n_tr = int(args.n * 0.8)
    tr = MultiModalArrays(
        jnp.asarray(tpm[:n_tr]), jnp.asarray(beta[:n_tr]), jnp.asarray(site[:n_tr])
    )
    va = MultiModalArrays(
        jnp.asarray(tpm[n_tr:]), jnp.asarray(beta[n_tr:]), jnp.asarray(site[n_tr:])
    )
    jax.block_until_ready((tr, va))

    from vae_los_angeles_tpu.training.tasks import TASKS

    task = TASKS["rna2dna"]
    keys = jax.random.split(jax.random.PRNGKey(0), args.pop)
    hp = engine.hyperparams(cfg)
    pop_hp = {
        k: jnp.broadcast_to(v, (args.pop,) + v.shape) for k, v in hp.items()
    }
    pop_hp["lr"] = jnp.asarray(
        np.geomspace(1e-4, 1e-3, args.pop), jnp.float32
    )

    init_v = jax.jit(
        jax.vmap(lambda k, lr: engine.init_carry(*task.init(k, cfg, n_sites), lr))
    )

    def run(label, **fit_kwargs):
        fit = engine.build_fit_fn(
            "rna2dna", args.epochs, cfg.batch_size, n_tr, args.n - n_tr,
            True, False, stop_via_mask=True, **fit_kwargs,
        )
        fit_v = jax.jit(jax.vmap(fit, in_axes=(0, None, None, 0, None, 0, None)))

        def once():
            carry0 = init_v(keys, pop_hp["lr"])
            res = fit_v(carry0, tr, va, pop_hp, None, keys, jnp.int32(0))
            # device_get: on the axon relay block_until_ready returns early
            vals = jax.device_get(res.best_val_loss)
            return np.asarray(vals)

        t0 = time.perf_counter()
        vals = once()
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        vals = once()
        steady = time.perf_counter() - t0
        print(
            f"{label:<22} compile+run {compile_and_run:7.2f}s | "
            f"steady {steady:7.3f}s | best_val {np.round(vals, 2)}"
        )
        return compile_and_run, steady

    print(
        f"population={args.pop} epochs={args.epochs} n={args.n} "
        f"dims={cfg.input_dim_a}/{cfg.input_dim_b} "
        f"backend={jax.default_backend()}"
    )
    xla = run("vmap(xla fused scan)")
    try:
        pallas_step = run("vmap(pallas step)", fused_step=True)
    except Exception as e:
        pallas_step = None
        print(f"vmap(pallas step) FAILED: {type(e).__name__}: {str(e)[:300]}")
    try:
        pallas_epoch = run("vmap(pallas epoch)", fused_epoch=True)
    except Exception as e:
        pallas_epoch = None
        print(f"vmap(pallas epoch) FAILED: {type(e).__name__}: {str(e)[:300]}")

    if pallas_epoch:
        print(f"\nspeedup epoch-megakernel vs xla: {xla[1] / pallas_epoch[1]:.2f}x")
    if pallas_step:
        print(f"speedup step-kernel vs xla:      {xla[1] / pallas_step[1]:.2f}x")


if __name__ == "__main__":
    main()
