#!/usr/bin/env python
"""Benchmark: full 200-epoch RNA→DNA directional-VAE training on one chip.

Measures the BASELINE.json north-star metric — wall-clock for a complete
200-epoch rna2dna training run (reference defaults: batch 32, AdamW 5e-4,
β-warmup, plateau scheduler; early stopping disabled so all 200 epochs are
actually executed) on a synthetic dataset with the reference's live feature
dims (1177 RNA / 1211 DNA, 24 sites). The whole run is ONE device dispatch
(`training.engine.fit`).

Prints one JSON line:
  {"metric": "rna2dna_200epoch_wallclock", "value": <seconds>, "unit": "s",
   "vs_baseline": <60s target / measured — higher is better>}

Modes (BENCH_MODE env): epoch (Pallas whole-epoch megakernel, default on
TPU) | step (per-step fused kernel) | xla (pure-XLA fused scan) | dp
(XLA scan sharded over a "data" mesh of all visible chips — degenerates to
single-chip when only one device is visible, so the multi-chip number is one
command away on real hardware).

NOTE: deliberately NO JAX_COMPILATION_CACHE_DIR here — on the axon
remote-compile relay the local executable-serialization cache measured
3-10x slower compiles (benchmarks/RESULTS.md "compilation cache
anti-result"); round 1's 762 s compile+run was exactly this foot-gun.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine

N_SAMPLES = int(os.getenv("BENCH_SAMPLES", "8000"))  # TCGA-scale matched cohort
N_SITES = 24
TARGET_SECONDS = 60.0  # BASELINE.json north star: 200 epochs < 60 s
EPOCHS = int(os.getenv("BENCH_EPOCHS", "200"))


def _backend_pinned_or_initialized() -> bool:
    """True when probing would be pointless: the backend is already
    initialized (e.g. bench imported into a running process), or the
    platform is explicitly pinned off the relay (tests force
    jax_platforms=cpu; the axon ``sitecustomize`` ignores the
    ``JAX_PLATFORMS`` env a subprocess would inherit, so probing would hit
    the relay the parent will never use)."""
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        return True
    pinned = jax.config.jax_platforms
    return bool(pinned and "tpu" not in pinned and "axon" not in pinned)


def _probe_backend(timeout: float = 180.0) -> bool:
    """One bounded OUT-OF-PROCESS backend-visibility probe (a failed
    in-process init pins the error for the process lifetime, and relay init
    is load-dependent — it can hang for minutes)."""
    import subprocess

    try:
        return (
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=timeout,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(attempts: int, wait_s: float) -> bool:
    """Ride out transient relay flaps before first backend use.

    Never raises: when every probe fails the process falls back to the CPU
    backend (the platform flip must happen before first backend use — the
    axon ``sitecustomize`` ignores a ``JAX_PLATFORMS`` env var, so it is
    done via ``jax.config.update`` here) and returns True, so the driver
    contract still records an honest, annotated measurement instead of an
    init traceback when the relay is down for the whole bench window."""
    if _backend_pinned_or_initialized():
        return False

    for i in range(attempts):
        if _probe_backend():
            return False
        if i < attempts - 1:
            print(
                f"backend probe failed (attempt {i + 1}/{attempts}); "
                f"retrying in {wait_s:.0f}s",
                file=sys.stderr,
            )
            time.sleep(wait_s)
    print(
        f"TPU backend unreachable after {attempts} probes — falling back to "
        "the CPU backend so the bench still records an honest number "
        "(measured CPU reference: ~393 s steady-state for this workload; "
        "the TPU megakernel number is 0.5-0.6 s, see benchmarks/RESULTS.md)",
        file=sys.stderr,
    )
    jax.config.update("jax_platforms", "cpu")
    return True


def main():
    cfg = Config.from_env().replace(patience=10_000)  # run all 200 epochs
    cpu_fallback = _wait_for_backend(
        attempts=int(os.getenv("BENCH_INIT_RETRIES", "3")),
        wait_s=float(os.getenv("BENCH_INIT_WAIT_S", "60")),
    )
    # Backend init + first round-trip, timed SEPARATELY: on the relay this
    # fixed cost is large and load-dependent (150-250 s measured, RESULTS.md
    # compile ledger) and has nothing to do with XLA compilation — folding
    # it into "compile" made BENCH_r02's 833 s tail unreadable.
    t0 = time.perf_counter()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    float(jax.device_get(jnp.zeros((8, 128)).sum()))
    init_s = time.perf_counter() - t0

    tpm, beta, site = generate_synthetic_arrays(
        n_samples=N_SAMPLES,
        dim_a=cfg.input_dim_a,
        dim_b=cfg.input_dim_b,
        n_sites=N_SITES,
        seed=0,
    )
    tr_idx, va_idx = train_val_indices(N_SAMPLES, cfg.train_test_split, cfg.random_seed)
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))
    train_arrays, val_arrays = arrays.take(tr_idx), arrays.take(va_idx)
    # device_get, not block_until_ready (the relay's returns early): the
    # dataset must be ON DEVICE before the compile timer starts
    t0 = time.perf_counter()
    for tbl in (train_arrays, val_arrays):  # force ALL six arrays: a
        # pending transfer would otherwise leak into the compile timer
        for leaf in (tbl.tpm, tbl.beta, tbl.site):
            float(jax.device_get(leaf[0] if leaf.ndim == 1 else leaf[0, 0]))
    place_s = time.perf_counter() - t0

    # fastest path on TPU: the whole-epoch Pallas megakernel (every AdamW
    # step of an epoch in ONE kernel, params+moments VMEM-resident).
    # BENCH_MODE=step uses the per-step fused kernel; BENCH_MODE=xla the
    # pure-XLA fused scan; BENCH_MODE=dp shards the run over all chips.
    mode = os.getenv("BENCH_MODE", "epoch") if jax.default_backend() == "tpu" else "xla"
    if os.getenv("BENCH_MODE") == "dp" or "--dp" in sys.argv:
        mode = "dp"  # honored on any backend (dp runs the mesh-sharded XLA path)

    mesh = None
    if mode == "dp":
        from vae_los_angeles_tpu.parallel import sharding as _sharding

        mesh = _sharding.make_mesh(len(jax.devices()))
        print(
            f"dp mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
            file=sys.stderr,
        )

    def run(seed):
        res = engine.fit(
            "rna2dna",
            cfg,
            train_arrays,
            val_arrays,
            jax.random.PRNGKey(seed),
            N_SITES,
            num_epochs=EPOCHS,
            fused_step=(mode == "step"),
            fused_epoch=(mode == "epoch"),
            mesh=mesh,
        )
        # NOTE: device_get, not block_until_ready — the axon remote relay
        # returns from block_until_ready before execution completes, so an
        # honest wall-clock must fetch a value.
        float(jax.device_get(res.best_val_loss))
        np.asarray(res.val_losses[-1])
        return res

    t0 = time.perf_counter()
    run(0)  # compile + first run
    compile_and_run = time.perf_counter() - t0

    # median-of-N steady-state (default 5): single-shot measurements on the
    # relay carry dispatch-latency noise an order of magnitude above the
    # run's own variance, and round-over-round trend reading needs a spread,
    # not just a point (BENCH_r04's 0.64 s vs r03's 0.53 s was
    # unclassifiable under best-of-2). Per-run walls go to stderr and the
    # min/max spread rides the JSON line so a swing is classifiable as
    # noise or regression at a glance. BENCH_RUNS overrides N (the CPU
    # fallback drops to 2 — each run is ~390 s there).
    n_runs = max(1, int(os.getenv("BENCH_RUNS", "2" if cpu_fallback else "5")))
    walls = []
    for seed in range(1, n_runs + 1):
        t0 = time.perf_counter()
        res = run(seed)
        walls.append(time.perf_counter() - t0)
        print(f"steady run {seed}/{n_runs}: {walls[-1]:.3f}s", file=sys.stderr)
    wall = sorted(walls)[len(walls) // 2] if n_runs >= 3 else min(walls)

    n_train = len(tr_idx)
    samples_per_sec = EPOCHS * (n_train // cfg.batch_size) * cfg.batch_size / wall
    compile_s = max(0.0, compile_and_run - wall)  # clamp: run-to-run noise can exceed compile on CPU
    print(
        f"backend init: {init_s:.2f}s | data placement: {place_s:.2f}s | "
        f"compile: {compile_s:.2f}s | compile+run: {compile_and_run:.2f}s | "
        f"steady-state 200-epoch run (median of {n_runs}): {wall:.2f}s | "
        f"walls min/max {min(walls):.3f}/{max(walls):.3f}s | "
        f"{samples_per_sec:,.0f} samples/s | "
        f"final val loss {float(res.val_losses[-1]):.2f} | "
        f"mode={mode}",
        file=sys.stderr,
    )
    line = {
        "metric": "rna2dna_200epoch_wallclock",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(TARGET_SECONDS / wall, 2),
        "runs": n_runs,
        "spread_s": [round(min(walls), 3), round(max(walls), 3)],
    }
    if cpu_fallback:
        line["platform"] = "cpu (TPU relay unreachable; see stderr)"
    print(json.dumps(line))


if __name__ == "__main__":
    main()
