#!/usr/bin/env python
"""Whole-methylome-width scale demo: train a directional VAE whose target
panel is hundreds of thousands of probes, not the reference's 1,211.

docs/SCALING.md argues the mesh machinery pays once the wide DecoderB/
EncoderB layers stop being small (450k-probe methylome → the 512×dim_b
weight alone is ~0.9 GB fp32). This script substantiates that with two
executable demos:

1. ``--mode single`` (default; run on the real TPU): the UNCHANGED engine
   trains rna2dna at ``--dim_b`` width on one chip — params+moments+batch
   all HBM-resident, same fused whole-run scan as the headline bench.
2. ``--mode tp`` (runs anywhere; CI uses the 8-device virtual CPU mesh):
   the sharded DP×TP train step (`parallel/sharding.py`) at the same width —
   the 512×dim_b weight is Megatron-split over the "model" axis, so each
   device holds 1/model_parallel of it. Verifies the sharding actually
   happened and times a few steps.

    python benchmarks/bench_wide.py --dim_b 450000 --mode single
    python benchmarks/bench_wide.py --dim_b 450000 --mode tp  # CPU mesh ok

Synthetic data is generated directly at width (float32 rows stream to
device once); n is kept small — the point is layer WIDTH, not cohort size
(cohort scale is the 300k-sample megakernel demo in RESULTS.md).
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
    ap.add_argument("--dim_a", type=int, default=1177)
    ap.add_argument("--dim_b", type=int, default=450_000,
                    help="target panel width (Illumina 450k methylome)")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--mode", choices=["single", "tp"], default="single")
    ap.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="bfloat16 = MXU-native matmul operands (fp32 "
                         "accumulation + fp32 optimizer): the mixed-precision "
                         "policy's target regime is exactly this wide bench")
    ap.add_argument("--moments_dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="bfloat16 = AdamW m/v STORED reduced (fp32 math): "
                         "the wide step is HBM-sweep-bound over "
                         "params+moments, so this cuts ~1/3 of the swept "
                         "bytes (ops.optim.adamw_init)")
    ap.add_argument("--optimizer", choices=["adamw", "adafactor"],
                    default="adamw",
                    help="adafactor = factored second moments, no first "
                         "moment: the optimizer sweep drops from 3x to ~1x "
                         "the weight bytes — the biggest wide-regime lever "
                         "(ops.optim.adafactor_init)")
    ap.add_argument("--model_parallel", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8,
                    help="tp mode: width of the VIRTUAL CPU mesh (default 8); "
                         "pass 0 on a genuine multi-chip host to use the real "
                         "visible chips instead")
    args = ap.parse_args()

    if args.mode == "tp" and args.devices:
        # The virtual CPU-mesh demo (the default — it works on any host,
        # including the project's 1-chip TPU platform): the platform flip
        # must happen BEFORE first backend use (even jax.device_count()
        # initializes it, so there is no way to probe the real platform
        # first in-process — the dryrun solves that with a subprocess; a
        # benchmark doesn't need to). --devices 0 skips the flip and runs
        # on whatever chips are really visible.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.data.dataset import MultiModalArrays

    cfg = Config(input_dim_b=args.dim_b, input_dim_a=args.dim_a,
                 batch_size=args.batch_size, patience=10_000,
                 compute_dtype=args.compute_dtype,
                 moments_dtype=args.moments_dtype,
                 optimizer=args.optimizer)
    n_sites = 24
    print(f"devices: {jax.device_count()}×{jax.devices()[0].platform} | "
          f"dim_b={args.dim_b:,} → 512×dim_b decoder weight "
          f"{512 * args.dim_b * 4 / 1e9:.2f} GB fp32", file=sys.stderr)

    rng = np.random.default_rng(0)
    tpm = rng.standard_normal((args.n, args.dim_a), dtype=np.float32)
    beta = rng.random((args.n, args.dim_b), dtype=np.float32)
    site = rng.integers(0, n_sites, args.n).astype(np.int32)

    if args.mode == "single":
        from vae_los_angeles_tpu.training import engine

        n_tr = int(args.n * 0.8)
        tr = MultiModalArrays(jnp.asarray(tpm[:n_tr]), jnp.asarray(beta[:n_tr]),
                              jnp.asarray(site[:n_tr]))
        va = MultiModalArrays(jnp.asarray(tpm[n_tr:]), jnp.asarray(beta[n_tr:]),
                              jnp.asarray(site[n_tr:]))

        def once(seed):
            t0 = time.perf_counter()
            res = engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(seed),
                             n_sites, num_epochs=args.epochs)
            float(jax.device_get(res.best_val_loss))
            return time.perf_counter() - t0

        first = once(0)
        steady = once(1)
        spb = steady / args.epochs
        n_steps = (n_tr // cfg.batch_size) * args.epochs
        print(f"single-chip wide fit: compile {first - steady:.1f}s | "
              f"steady {steady:.3f}s for {args.epochs} epochs "
              f"({spb * 1e3:.1f} ms/epoch, "
              f"{n_tr * args.epochs / steady:,.0f} samples/s, "
              f"{n_steps / steady:,.0f} steps/s)", file=sys.stderr)
        import json
        print(json.dumps({
            "metric": f"rna2dna_wide{args.dim_b}_epoch_ms"
                      + ("_bf16" if args.compute_dtype == "bfloat16" else "")
                      + ("_bf16m" if args.moments_dtype == "bfloat16" else "")
                      + ("_af" if args.optimizer == "adafactor" else ""),
            "value": round(spb * 1e3, 2), "unit": "ms",
            "vs_baseline": None,
        }))
    else:
        from vae_los_angeles_tpu.parallel import sharding

        n_dev = args.devices or jax.device_count()
        mesh = sharding.make_mesh(n_dev, model_parallel=args.model_parallel)
        key = jax.random.PRNGKey(0)
        params, state, opt = sharding.make_sharded_train_state(
            "rna2dna", cfg, n_sites, mesh, key
        )
        # fc3 is the genuinely wide layer: 512 → dim_b, row-parallel over
        # the 512 contraction dim (parallel/sharding.py _TP_LAYERS)
        w = params["decoder_dna"]["fc3"]["w"]
        shard_shape = w.addressable_shards[0].data.shape
        assert not w.sharding.is_fully_replicated, (
            "wide decoder weight must be model-sharded"
        )
        assert shard_shape[0] == w.shape[0] // args.model_parallel
        print(f"tp mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}: "
              f"decoder 512×{args.dim_b:,} weight shard/device = "
              f"{shard_shape} ({np.prod(shard_shape) * 4 / 1e6:.0f} MB of "
              f"{np.prod(w.shape) * 4 / 1e6:.0f} MB)",
              file=sys.stderr)
        n_rows = cfg.batch_size * (n_dev // args.model_parallel)
        batch = sharding.shard_arrays(
            MultiModalArrays(jnp.asarray(tpm[:n_rows]),
                             jnp.asarray(beta[:n_rows]),
                             jnp.asarray(site[:n_rows])), mesh)
        # donate: in-place state updates — without it the multi-GB wide
        # params+opt state double-buffers across the step boundary
        step = sharding.sharded_train_step(
            "rna2dna", compute_dtype=args.compute_dtype,
            optimizer=args.optimizer, donate=True,
        )
        sargs = (jnp.float32(5e-4), jnp.float32(1e-5), jnp.float32(1e-3),
                 jnp.float32(1.0))
        t0 = time.perf_counter()
        params, state, opt, loss = step(params, state, opt, batch, key, *sargs)
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        assert bool(jnp.isfinite(loss)), "wide TP step produced non-finite loss"
        t0 = time.perf_counter()
        for _ in range(3):
            params, state, opt, loss = step(params, state, opt, batch, key,
                                            *sargs)
        jax.block_until_ready(loss)
        steady = (time.perf_counter() - t0) / 3
        print(f"tp wide step: compile+run {compile_s:.1f}s | "
              f"steady {steady * 1e3:.1f} ms/step | loss {float(loss):.1f}",
              file=sys.stderr)
        import json
        print(json.dumps({
            "metric": f"rna2dna_wide{args.dim_b}_tp_step_ms"
                      + ("_bf16" if args.compute_dtype == "bfloat16" else "")
                      + ("_bf16m" if args.moments_dtype == "bfloat16" else "")
                      + ("_af" if args.optimizer == "adafactor" else ""),
            "value": round(steady * 1e3, 2), "unit": "ms",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
