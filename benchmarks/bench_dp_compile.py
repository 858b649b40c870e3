#!/usr/bin/env python
"""A/B the GSPMD partitioning cost of the data-parallel fused run vs the
inner batch-scan unroll factor.

The `--dp` whole-run program pays a ~255 s cold compile on the relay
(benchmarks/RESULTS.md compile ledger) where the unsharded program pays
~30 s — the delta is GSPMD propagating the sample-axis sharding through the
scanned epoch body, whose HLO size scales with the unroll factor (8 on TPU).
Cold-compile timing on the relay is load-dependent (101-432 s observed for
one identical program), so this A/B runs on the 8-device virtual CPU mesh
where `jit(...).lower().compile()` is local and repeatable; the RELATIVE
cost across unroll factors is what transfers.

    python benchmarks/bench_dp_compile.py [--n 2048] [--epochs 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax.numpy as jnp

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    from jax.sharding import Mesh

    mesh = Mesh(jax.devices()[:8], ("data",))
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

    for unroll in (1, 2, 4, 8):
        engine._batch_unroll_override = unroll
        try:
            for label, m in (("dp", mesh), ("plain", None)):
                engine.build_fit_fn.cache_clear()
                engine._build_fit.cache_clear()
                jax.clear_caches()
                t0 = time.perf_counter()
                res = engine.fit(
                    "rna2dna", cfg, tr, va, jax.random.PRNGKey(0), 24,
                    num_epochs=args.epochs, mesh=m,
                )
                float(jax.device_get(res.best_val_loss))
                wall = time.perf_counter() - t0
                print(f"unroll={unroll} {label:<5} compile+run {wall:7.1f}s",
                      flush=True)
        finally:
            engine._batch_unroll_override = None


if __name__ == "__main__":
    main()
