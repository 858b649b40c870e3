#!/usr/bin/env python
"""Training wall-clock benchmark for any VAE family and kernel mode.

Generalizes the driver contract in ../bench.py (which pins the north-star
rna2dna configuration): full 200-epoch training at the reference's live dims
on synthetic TCGA-scale data, early stopping disabled so every epoch
executes, timed by value-fetch (jax.device_get — see benchmarks/RESULTS.md
on relay timing).

Usage:
  python benchmarks/bench_training.py --task multimodal --mode epoch
  python benchmarks/bench_training.py --task dna2rna --mode step --epochs 200

Modes: epoch = whole-epoch Pallas megakernel, step = per-step fused Pallas
train kernel, xla = pure-XLA fused scan. Off-TPU only xla runs natively
(Pallas falls back to interpret mode, which is orders slower — don't).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# deliberately NO JAX_COMPILATION_CACHE_DIR — on the axon remote-compile
# relay local executable serialization measured 3-10x SLOWER first-run
# compiles (benchmarks/RESULTS.md anti-result; same rationale as bench.py)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--task",
        choices=["rna2dna", "dna2rna", "multimodal"],
        default="multimodal",
    )
    parser.add_argument("--mode", choices=["epoch", "step", "xla"], default="epoch")
    parser.add_argument("--n", type=int, default=8000)
    parser.add_argument("--sites", type=int, default=24)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--repeats", type=int, default=2,
                        help="timed runs after the compile run")
    args = parser.parse_args()

    cfg = Config.from_env().replace(patience=10_000)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    tpm, beta, site = generate_synthetic_arrays(
        n_samples=args.n, dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b,
        n_sites=args.sites, seed=0,
    )
    tr_idx, va_idx = train_val_indices(args.n, cfg.train_test_split,
                                       cfg.random_seed)
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                              jnp.asarray(site))
    train_arrays, val_arrays = arrays.take(tr_idx), arrays.take(va_idx)
    jax.block_until_ready((train_arrays, val_arrays))
    class_weights = (
        jnp.ones((args.sites,), jnp.float32)
        if args.task == "multimodal"
        else None
    )

    def run(seed):
        res = engine.fit(
            args.task, cfg, train_arrays, val_arrays, jax.random.PRNGKey(seed),
            args.sites, num_epochs=args.epochs, class_weights=class_weights,
            fused_step=(args.mode == "step"),
            fused_epoch=(args.mode == "epoch"),
        )
        # value fetch = honest sync on relay platforms
        float(jax.device_get(res.best_val_loss))
        np.asarray(res.val_losses[-1])
        return res

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0

    best = np.inf
    for r in range(args.repeats):
        t0 = time.perf_counter()
        run(r + 1)
        best = min(best, time.perf_counter() - t0)

    n_train = len(tr_idx)
    print(
        f"task={args.task} mode={args.mode}: compile+run {compile_s:.2f}s | "
        f"steady {best:.2f}s for {args.epochs} epochs "
        f"({n_train * args.epochs / best:,.0f} samples/s)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"{args.task}_{args.epochs}epoch_wallclock_{args.mode}",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / best, 2),
    }))


if __name__ == "__main__":
    main()
