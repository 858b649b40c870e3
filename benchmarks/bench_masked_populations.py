"""Masked vs exact-shape fold populations: warm overhead + cold structure.

Round-5 measurement driver (results in RESULTS.md "Masked-dynamic-size
fold/trial populations"): reference dims, an 890-sample cohort split into
3 uneven KFold folds, 10 epochs, interleaved warm rounds in one process.

    PYTHONPATH=. python benchmarks/bench_masked_populations.py

Measured on the chip (round-5 HEAD): masked warm 1.653 s vs exact-shape
1.740 s (masking costs nothing warm and dispatches once instead of
twice); masked = ONE program for both fold shapes, and a re-sized cohort
in the same buckets compiles nothing (5.2 s vs a second cold stack).
"""

import time

import jax
import jax.numpy as jnp

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import kfold_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.parallel import vmap_meta


def main(n=890, folds=3, epochs=10, rounds=3):
    print("backend:", jax.default_backend(), flush=True)
    cfg = Config.from_env()
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b,
        n_sites=24, seed=0)
    arr = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                           jnp.asarray(site))
    idx = kfold_indices(n, folds)
    ftr = [arr.take(tr) for tr, _ in idx]
    fva = [arr.take(va) for _, va in idx]
    key = jax.random.PRNGKey(0)

    def run(mask):
        return vmap_meta.fit_folds("rna2dna", cfg, ftr, fva, key, 24,
                                   num_epochs=epochs, mask_sizes=mask)

    for mask in (True, False):
        t0 = time.time()
        run(mask)
        print(f"mask={mask} cold (incl. any session init): "
              f"{time.time() - t0:.1f}s", flush=True)
    walls = {True: [], False: []}
    for _ in range(rounds):
        for mask in (True, False):
            t0 = time.time()
            run(mask)
            walls[mask].append(time.time() - t0)
    for mask in (True, False):
        w = sorted(walls[mask])
        print(f"mask={mask} warm median {w[len(w) // 2]:.3f}s "
              f"walls {['%.3f' % x for x in walls[mask]]}")

    # the headline regression check: a RE-SIZED cohort in the same
    # bucket_rows buckets must reuse the masked program (data staging +
    # dispatch only — a multi-minute wall here is a recompile regression)
    n2 = n + 2
    tpm2, beta2, site2 = generate_synthetic_arrays(
        n_samples=n2, dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b,
        n_sites=24, seed=1)
    arr2 = MultiModalArrays(jnp.asarray(tpm2), jnp.asarray(beta2),
                            jnp.asarray(site2))
    idx2 = kfold_indices(n2, folds)
    t0 = time.time()
    vmap_meta.fit_folds(
        "rna2dna", cfg, [arr2.take(tr) for tr, _ in idx2],
        [arr2.take(va) for _, va in idx2], key, 24, num_epochs=epochs,
        mask_sizes=True,
    )
    print(f"re-sized cohort (n={n2}, same buckets): "
          f"{time.time() - t0:.1f}s  (must be seconds, not minutes)")


if __name__ == "__main__":
    main()
