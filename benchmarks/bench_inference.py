#!/usr/bin/env python
"""Serving / inference throughput benchmark: batch-size sweep of the
eval-mode cross-modal imputation forward (encode → mean-fuse → sample →
decode) on one chip, XLA path vs the fused Pallas kernel.

The production-serving story of the framework: imputing the missing modality
for incoming samples (reconstruct_unmatched.py's workload). Measures latency
per batch and samples/s at the reference's live dims.

Usage: python benchmarks/bench_inference.py [--direction rna2dna]
       [--batches 32 256 1024 4096] [--iters 100]
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
from vae_los_angeles_tpu.models import (
    dna2rna_vae_apply,
    dna2rna_vae_init,
    rna2dna_vae_apply,
    rna2dna_vae_init,
)
from vae_los_angeles_tpu.ops.pallas.fused_vae import FusedDNA2RNA, FusedRNA2DNA

N_SITES = 24


def time_fn(fn, iters):
    fn()  # compile
    jax.device_get(fn())  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)  # value fetch = honest sync on relay platforms
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--direction", choices=["rna2dna", "dna2rna"], default="rna2dna"
    )
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[32, 256, 1024, 4096])
    parser.add_argument("--iters", type=int, default=100)
    args = parser.parse_args()

    cfg = Config.from_env()
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.direction == "rna2dna":
        params, state = rna2dna_vae_init(
            key, cfg.input_dim_a, cfg.input_dim_b, N_SITES, cfg.latent_dim
        )
        apply_fn, input_kw, in_dim = rna2dna_vae_apply, "rna", cfg.input_dim_a
        fused = FusedRNA2DNA(params, state)
    else:
        params, state = dna2rna_vae_init(
            key, cfg.input_dim_a, cfg.input_dim_b, N_SITES, cfg.latent_dim
        )
        apply_fn, input_kw, in_dim = dna2rna_vae_apply, "dna", cfg.input_dim_b
        fused = FusedDNA2RNA(params, state)

    @jax.jit
    def xla_forward(x, site, k):
        out = apply_fn(
            params, state, k, **{input_kw: x}, site=site, train=False
        )
        return out.recon

    # single-dispatch wrapper: on relay platforms every un-jitted op is a
    # round trip, so jit the whole fused call (incl. the one-hot prep)
    @jax.jit
    def pallas_forward(x, site):
        return fused(**{input_kw: x}, site=site, seed=1)[0]

    rows = []
    for b in args.batches:
        x = jax.random.uniform(key, (b, in_dim), jnp.float32)
        site = jnp.zeros((b,), jnp.int32)
        t_xla = time_fn(lambda: xla_forward(x, site, key), args.iters)
        t_pls = time_fn(lambda: pallas_forward(x, site), args.iters)
        rows.append((b, t_xla, t_pls))
        print(
            f"batch {b:5d}: XLA {t_xla*1e3:7.3f} ms ({b/t_xla:>12,.0f}/s) | "
            f"Pallas {t_pls*1e3:7.3f} ms ({b/t_pls:>12,.0f}/s) | "
            f"{t_xla/t_pls:4.2f}x",
            file=sys.stderr,
        )

    best = max(rows, key=lambda r: r[0] / min(r[1], r[2]))
    print(json.dumps({
        "metric": f"{args.direction}_inference_samples_per_s",
        "value": round(best[0] / min(best[1], best[2])),
        "unit": "samples/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
