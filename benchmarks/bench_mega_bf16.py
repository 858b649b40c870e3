"""Megakernel × bf16 composition A/B (round-5 anti-result driver).

Results in RESULTS.md "Anti-result: megakernel × bf16 composition":
fp32 megakernel 0.619 s vs XLA-bf16 1.628 s vs XLA-fp32 1.651 s for the
200-epoch reference recipe — bf16 buys 1.4% at batch 32 and the
megakernel's VMEM-residency win dwarfs it, so USE_PALLAS=1 +
COMPUTE_DTYPE=bfloat16 deliberately routes to XLA with a notice.

    PYTHONPATH=. python benchmarks/bench_mega_bf16.py
"""

import time

import jax
import jax.numpy as jnp

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.training import engine


def main(n=8000, epochs=200, rounds=3):
    print("backend:", jax.default_backend(), flush=True)
    cfg32 = Config.from_env().replace(patience=10_000)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=cfg32.input_dim_a, dim_b=cfg32.input_dim_b,
        n_sites=24, seed=0)
    tr_idx, va_idx = train_val_indices(n, cfg32.train_test_split,
                                       cfg32.random_seed)
    arr = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                           jnp.asarray(site))
    tra, vaa = arr.take(tr_idx), arr.take(va_idx)
    for tbl in (tra, vaa):
        for leaf in (tbl.tpm, tbl.beta, tbl.site):
            float(jax.device_get(leaf[0] if leaf.ndim == 1 else leaf[0, 0]))

    def run(cfg, fused_epoch, seed):
        res = engine.fit("rna2dna", cfg, tra, vaa, jax.random.PRNGKey(seed),
                         24, num_epochs=epochs, fused_epoch=fused_epoch)
        float(jax.device_get(res.best_val_loss))
        return res

    on_tpu = jax.default_backend() == "tpu"
    variants = [("xla-fp32", cfg32, False), ("xla-bf16", cfg16, False)]
    if on_tpu:
        variants.insert(0, ("mega-fp32", cfg32, True))
    for name, cfg, fe in variants:
        t0 = time.time()
        run(cfg, fe, 0)
        print(f"{name} compile+run: {time.time() - t0:.1f}s", flush=True)
    walls = {name: [] for name, _, _ in variants}
    for r in range(1, rounds + 1):
        for name, cfg, fe in variants:
            t0 = time.time()
            run(cfg, fe, r)
            walls[name].append(time.time() - t0)
    for name in walls:
        w = sorted(walls[name])
        print(f"{name}: median {w[len(w) // 2]:.3f}s "
              f"walls {['%.3f' % x for x in walls[name]]}")


if __name__ == "__main__":
    main()
