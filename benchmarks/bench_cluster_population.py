"""Member-batched vs sequential clustering-capstone stack at n=1024.

Round-5 measurement driver (results in RESULTS.md "Member-batched
clustering capstone"): 3 imputation-method feature spaces over one
n=1024 cohort at the capstone's RNA+DNA width, EVAL_BACKEND=tpu,
interleaved warm rounds in one process.

    EVAL_BACKEND=tpu PYTHONPATH=. python benchmarks/bench_cluster_population.py

Measured on the chip (round-5 HEAD): grouped warm 0.73-0.86 s vs
sequential 1.56-1.62 s (2.0-2.1×; per stage scale+PCA 2.0×, t-SNE 1.4×,
fused scores 2.1×), identical scores.
"""

import os
import time

os.environ.setdefault("EVAL_BACKEND", "tpu")

import numpy as np  # noqa: E402

from vae_los_angeles_tpu.evaluation.clustering.common import (  # noqa: E402
    analyze_cohort_population,
    cluster_scores,
    perform_dimensionality_reduction,
)


def main(m=3, n=1024, d=2388, rounds=2):
    import jax

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    feats = [(np.repeat(rng.normal(size=(24, d)), n // 24 + 1, axis=0)[:n]
              + 0.5 * rng.normal(size=(n, d))).astype(np.float32)
             for _ in range(m)]
    labels = np.repeat(np.arange(24), n // 24 + 1)[:n]

    def sequential():
        out = []
        for f in feats:
            pca2, tsne2 = perform_dimensionality_reduction(f)
            out.append(cluster_scores(f, labels, pca2, tsne2))
        return out

    def grouped():
        return analyze_cohort_population(feats, labels)

    t0 = time.time(); grouped()
    print(f"grouped COLD: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time(); sequential()
    print(f"sequential COLD: {time.time() - t0:.1f}s", flush=True)
    for r in range(rounds):
        t0 = time.time(); g = grouped(); gw = time.time() - t0
        t0 = time.time(); s = sequential(); sw = time.time() - t0
        print(f"round {r}: grouped warm {gw:.2f}s | sequential warm "
              f"{sw:.2f}s", flush=True)
    print("grouped member0 scores:",
          {k: round(v, 3) for k, v in g[0][2].items()})
    print("seq     member0 scores:",
          {k: round(v, 3) for k, v in s[0].items()})


if __name__ == "__main__":
    main()
