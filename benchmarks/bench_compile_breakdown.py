#!/usr/bin/env python
"""Separate the axon relay's fixed backend-init cost from TRUE per-program
compile times (feeds the "compile-time ledger" in RESULTS.md).

Round-2 finding: the first device interaction in a process pays a large
fixed cost on the relay (backend init + first transfer, measured 150-250 s)
that has nothing to do with XLA compilation — a trivial jitted metrics
program "compiled" in 1.2 s once the backend was up. Every "compile" number
measured as first-call-minus-steady in a fresh process silently includes
that init cost. This script times init once, then compiles each training
program in the SAME process so the per-program numbers are honest:

    python benchmarks/bench_compile_breakdown.py [--n 8000] [--epochs 200]

Prints one line per stage; wall is synced with jax.device_get (relay's
block_until_ready returns early).
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
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--pop", type=int, default=4)
    ap.add_argument("--pop_epochs", type=int, default=50)
    args = ap.parse_args()

    t0 = time.perf_counter()
    jax.device_get(jnp.ones((8, 128)).sum())
    t_init = time.perf_counter() - t0
    print(f"backend init + first transfer: {t_init:7.1f}s "
          f"(backend={jax.default_backend()})")

    cfg = Config.from_env().replace(patience=10_000)
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=args.n, dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b,
        n_sites=24, seed=0,
    )
    tr_idx, va_idx = train_val_indices(args.n, cfg.train_test_split,
                                       cfg.random_seed)
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                              jnp.asarray(site))
    tr, va = arrays.take(tr_idx), arrays.take(va_idx)
    jax.device_get(tr.tpm[0, 0])

    def time_mode(label, **kw):
        def once(seed):
            t0 = time.perf_counter()
            res = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(seed),
                             24, num_epochs=args.epochs, **kw)
            float(jax.device_get(res.best_val_loss))
            return time.perf_counter() - t0
        first = once(0)
        steady = once(1)
        print(f"{label:<28} compile {first - steady:7.1f}s | "
              f"steady {steady:7.3f}s")

    time_mode("xla fused scan")
    if jax.default_backend() == "tpu":
        time_mode("pallas fused step", fused_step=True)
        time_mode("pallas whole-epoch kernel", fused_epoch=True)

    # vmapped population (the CV/HPO meta-loop program, stop_via_mask form)
    from vae_los_angeles_tpu.parallel import vmap_meta

    n2 = 2000
    tr2, va2 = arrays.take(tr_idx[:int(n2 * 0.8)]), arrays.take(
        va_idx[:n2 - int(n2 * 0.8)])
    pop = {"lr": np.geomspace(1e-4, 1e-3, args.pop).astype(np.float32)}

    def pop_once(seed):
        t0 = time.perf_counter()
        res = vmap_meta.fit_trials(
            "rna2dna", cfg, tr2, va2, jax.random.PRNGKey(seed), 24, pop,
            num_epochs=args.pop_epochs,
        )
        np.asarray(jax.device_get(res.best_val_loss))
        return time.perf_counter() - t0

    first = pop_once(0)
    steady = pop_once(1)
    print(f"{'vmapped pop fit (mask form)':<28} compile {first - steady:7.1f}s | "
          f"steady {steady:7.3f}s")


if __name__ == "__main__":
    main()
