#!/usr/bin/env python
"""MXU kNN (`ops/knn.py`, KNN_BACKEND=tpu) vs sklearn host kNN — the
baselines the CV/comparison harnesses run (reference
vae_cross_modality_cv.py:320, n_jobs=-1 joblib brute force).

    python benchmarks/bench_knn.py                 # CV scale (dim 1211)
    python benchmarks/bench_knn.py --dim 450000 --n 2000 --queries 512

Timing fetches predictions to host on both paths (apples-to-apples: the
harnesses consume numpy)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3200, help="training rows")
    ap.add_argument("--queries", type=int, default=800)
    ap.add_argument("--dim", type=int, default=1211)
    ap.add_argument("--targets", type=int, default=1177)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--conditioned", action="store_true",
                    help="site-conditioned variant: sklearn per-site model "
                         "loop vs one masked-distance kernel")
    ap.add_argument("--sites", type=int, default=12,
                    help="distinct site ids for --conditioned")
    args = ap.parse_args()

    from sklearn.neighbors import KNeighborsRegressor

    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )
    from vae_los_angeles_tpu.ops.knn import (
        ConditionedKNNRegressorTPU,
        KNNRegressorTPU,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    y = rng.normal(size=(args.n, args.targets)).astype(np.float32)
    q = rng.normal(size=(args.queries, args.dim)).astype(np.float32)
    print(f"n={args.n} dim={args.dim} queries={args.queries} "
          f"targets={args.targets} k={args.k}"
          + (f" sites={args.sites} (conditioned)" if args.conditioned else ""))

    if args.conditioned:
        x = np.column_stack([x, rng.integers(0, args.sites, args.n)])
        q = np.column_stack([q, rng.integers(0, args.sites, args.queries)])
        pairs = (
            ("sklearn(per-site)",
             ConditionedKNeighborsRegressor(n_neighbors=args.k)),
            ("tpu", ConditionedKNNRegressorTPU(n_neighbors=args.k)),
        )
    else:
        pairs = (
            ("sklearn(n_jobs=-1)",
             KNeighborsRegressor(n_neighbors=args.k, n_jobs=-1)),
            ("tpu", KNNRegressorTPU(n_neighbors=args.k)),
        )

    results = {}
    for name, model in pairs:
        model.fit(x, y)
        t0 = time.perf_counter()
        first = model.predict(q)
        first_s = time.perf_counter() - t0
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            pred = model.predict(q)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        results[name] = (best, first_s)
        # tpu 'first' includes compile + the train/query H2D transfers; the
        # steady number rides the device-put cache (ops/knn.py) like the
        # harnesses' grid searches do
        print(f"{name:>18}: {best * 1e3:9.1f} ms/predict steady "
              f"(first {first_s * 1e3:.0f} ms incl. compile+transfer)  "
              f"pred[0,0]={float(pred[0, 0]):.4f}")
        del first
    skl = results[pairs[0][0]]
    tpu = results["tpu"]
    print(f"tpu speedup: {skl[0] / tpu[0]:.1f}x steady, "
          f"{skl[1] / tpu[1]:.2f}x single-shot cold")


if __name__ == "__main__":
    main()
