#!/usr/bin/env python
"""TPU Gram-PCA (`ops/pca.py`, KNN_BACKEND=tpu) vs host sklearn
StandardScaler→PCA — the clustering scripts' reduction step (reference
cluster_reconstructed.py:140-187: PCA(2) for plotting + PCA-50 t-SNE
preprocessing on the full-width scaled matrix).

    python benchmarks/bench_pca.py                  # CV width
    python benchmarks/bench_pca.py --dim 450000 --n 2000

Times scale+PCA(2)+PCA(50) back-to-back like perform_dimensionality_reduction
does; the TPU path transfers the matrix once and returns only scores."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3200)
    ap.add_argument("--dim", type=int, default=21173)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    from vae_los_angeles_tpu.ops.pca import PCATPU, standardize_tpu

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 24, args.n)
    centers = rng.normal(size=(24, args.dim)) * 2.0
    x = (centers[labels] + rng.normal(size=(args.n, args.dim))).astype(
        np.float32
    )
    print(f"n={args.n} dim={args.dim}")

    def skl(mat):
        scaled = StandardScaler().fit_transform(mat)
        p2 = PCA(n_components=2, random_state=42)
        s2 = p2.fit_transform(scaled)
        s50 = PCA(n_components=50, random_state=42).fit_transform(scaled)
        return s2, s50, p2.explained_variance_ratio_.sum()

    def tpu(mat):
        import jax

        from vae_los_angeles_tpu.ops.cluster_metrics import _features_on_device

        scaled = standardize_tpu(_features_on_device(mat))
        p2 = PCATPU(n_components=2)
        s2 = p2.fit_transform(scaled)
        s50 = PCATPU(n_components=50).fit_transform(scaled)
        return s2, s50, p2.explained_variance_ratio_.sum()

    results = {}
    for name, fn in (("sklearn", skl), ("tpu", tpu)):
        t0 = time.perf_counter()
        s2, s50, evr = fn(x)
        first_s = time.perf_counter() - t0
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            s2, s50, evr = fn(x)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        results[name] = best
        print(f"{name:>8}: {best:8.3f} s/reduce steady (first {first_s:.1f} s)"
              f"  evr2={evr:.4f} |pc1[0]|={abs(s2[0, 0]):.3f} "
              f"s50norm={np.linalg.norm(s50[0]):.3f}")
    print(f"tpu speedup: {results['sklearn'] / results['tpu']:.1f}x steady")


if __name__ == "__main__":
    main()
