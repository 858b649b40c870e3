#!/usr/bin/env python
"""MXU clustering metrics (`ops/cluster_metrics.py`, KNN_BACKEND=tpu) vs
host sklearn — the silhouette+NH scoring the clustering scripts run on the
FULL-WIDTH scaled feature matrix (reference
cluster_reconstructed.py:296-318).

    python benchmarks/bench_cluster_metrics.py                  # RNA width
    python benchmarks/bench_cluster_metrics.py --dim 450000 --n 2000

Scores both metrics back-to-back like `cluster_scores` does — the TPU path
transfers the matrix once (device-put cache) and both metrics ride it."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3200, help="samples")
    ap.add_argument("--dim", type=int, default=21173,
                    help="feature width (default: RNA+DNA CV width)")
    ap.add_argument("--labels", type=int, default=24,
                    help="distinct site labels (reference cohort has 24)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from sklearn.metrics import silhouette_score

    from vae_los_angeles_tpu.evaluation.clustering.metrics_utils import (
        calculate_neighborhood_hit,
    )
    from vae_los_angeles_tpu.ops.cluster_metrics import (
        neighborhood_hit_tpu,
        silhouette_score_tpu,
    )

    rng = np.random.default_rng(0)
    labels = rng.integers(0, args.labels, args.n)
    centers = rng.normal(size=(args.labels, args.dim)) * 2.0
    x = (centers[labels] + rng.normal(size=(args.n, args.dim))).astype(
        np.float32
    )
    print(f"n={args.n} dim={args.dim} labels={args.labels} k={args.k}")

    def skl(mat):
        return (float(silhouette_score(mat, labels)),
                calculate_neighborhood_hit(mat, labels, k=args.k))

    def tpu(mat):
        return (silhouette_score_tpu(mat, labels),
                neighborhood_hit_tpu(mat, labels, k=args.k))

    results = {}
    for name, fn in (("sklearn", skl), ("tpu", tpu)):
        t0 = time.perf_counter()
        sil, nh = fn(x)
        first_s = time.perf_counter() - t0
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            sil, nh = fn(x)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        results[name] = (best, first_s)
        print(f"{name:>8}: {best:8.3f} s/score steady (first {first_s:.1f} s"
              f" incl. compile+transfer)  silhouette={sil:.4f} NH={nh:.4f}")
    print(f"tpu speedup: {results['sklearn'][0] / results['tpu'][0]:.1f}x "
          f"steady, {results['sklearn'][1] / results['tpu'][1]:.2f}x "
          f"single-shot cold")


if __name__ == "__main__":
    main()
