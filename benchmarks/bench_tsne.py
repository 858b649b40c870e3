#!/usr/bin/env python
"""TPU exact t-SNE (`ops/tsne.py`, KNN_BACKEND=tpu) vs host sklearn —
the embedding step of the clustering / kNN-comparison scripts (reference
cluster_reconstructed.py:178, run_comparison.py:185).

    python benchmarks/bench_tsne.py                  # PCA-50 regime (scripts')
    python benchmarks/bench_tsne.py --dim 1211 --n 1024 --no-pca50

Runs the spec the scripts use: n_components=2, random_state=42,
perplexity=min(30, n-1), on a PCA-50-preprocessed matrix (what
`perform_dimensionality_reduction` feeds t-SNE for >50-dim features).
Quality is reported as trustworthiness vs the ORIGINAL features so the
speed numbers carry their own validity check."""

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
                    help="raw feature width before PCA-50 (CV width default)")
    ap.add_argument("--labels", type=int, default=24)
    ap.add_argument("--no-pca50", action="store_true",
                    help="feed raw features instead of PCA-50 scores")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE, trustworthiness

    from vae_los_angeles_tpu.ops.tsne import TSNETPU

    rng = np.random.default_rng(0)
    labels = rng.integers(0, args.labels, args.n)
    centers = rng.normal(size=(args.labels, args.dim)) * 2.0
    x = (centers[labels] + rng.normal(size=(args.n, args.dim))).astype(
        np.float32
    )
    if args.no_pca50 or args.dim <= 50:
        feats = x
    else:
        feats = PCA(n_components=50, random_state=42).fit_transform(x).astype(
            np.float32
        )
    perp = min(30, args.n - 1)
    print(f"n={args.n} raw_dim={args.dim} tsne_dim={feats.shape[1]} "
          f"perplexity={perp}")

    results = {}
    for name, cls in (("sklearn", TSNE), ("tpu", TSNETPU)):
        t0 = time.perf_counter()
        y = cls(n_components=2, random_state=42,
                perplexity=perp).fit_transform(feats)
        first_s = time.perf_counter() - t0
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            y = cls(n_components=2, random_state=42,
                    perplexity=perp).fit_transform(feats)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        results[name] = (best, first_s)
        # trustworthiness on a subsample keeps the check itself cheap
        sub = rng.choice(args.n, size=min(args.n, 1500), replace=False)
        trust = trustworthiness(feats[sub], y[sub])
        print(f"{name:>8}: {best:8.3f} s/embed steady (first {first_s:.1f} s"
              f" incl. compile)  trustworthiness={trust:.4f}")
    print(f"tpu speedup: {results['sklearn'][0] / results['tpu'][0]:.1f}x "
          f"steady, {results['sklearn'][1] / results['tpu'][1]:.2f}x "
          f"single-shot cold")


if __name__ == "__main__":
    main()
