"""Member-batched clustering capstone (round-5 verdict item #4).

The capstone's 3 imputation methods × 2 cohorts ran a sequential host loop
(one scaler→PCA→t-SNE→metrics stack per (method, cohort)); the method axis
now batches into vmapped populations (`ops/pca.pca_scores_members`,
`ops/cluster_metrics.cluster_scores_tpu_members`,
`ops/tsne.tsne_fit_transform_members`,
`clustering/common.analyze_cohort_population`). Contracts:

  * scale / PCA / fused-scores member kernels reproduce the sequential
    per-member kernels EXACTLY (same math, vmapped lowering);
  * the member-batched t-SNE descent is STATISTICALLY equivalent to the
    sequential one (1000 chaotic iterations amplify batched-lowering ULPs,
    so embeddings are compared on quality, not coordinates — the same
    caveat as swapping BLAS backends under sklearn);
  * `analyze_cohort_grouped` routes to the population under the TPU
    backend and falls back sequentially under CLUSTER_VMAP=0 / diverging
    member shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.ops.backend import bucket_rows


def _members(m=3, n=90, d=120, seed=0):
    rng = np.random.default_rng(seed)
    feats = [
        (np.repeat(rng.normal(size=(5, d)), n // 5, axis=0)
         + 0.4 * rng.normal(size=(n, d)) + i).astype(np.float32)
        for i in range(m)
    ]
    labels = np.repeat(np.arange(5), n // 5)
    return feats, labels


def test_member_scale_pca_scores_match_sequential(monkeypatch):
    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    from vae_los_angeles_tpu.ops.cluster_metrics import (
        cluster_scores_tpu,
        cluster_scores_tpu_members,
    )
    from vae_los_angeles_tpu.ops.pca import (
        PCATPU,
        device_scaled_features,
        pca_scores_members,
        standardize_members,
    )

    feats, labels = _members()
    n = len(feats[0])
    n_pad = bucket_rows(n)
    stacked = jnp.asarray(np.stack(
        [np.pad(f, ((0, n_pad - n), (0, 0))) for f in feats]))
    scaled_m = standardize_members(stacked, np.int32(n))
    pca_m, evr_m = pca_scores_members(
        scaled_m, np.int32(n), 2, jax.lax.Precision.HIGHEST)
    scores_m = cluster_scores_tpu_members(feats, labels)
    for i, f in enumerate(feats):
        seq_scaled = device_scaled_features(f, shard=False)
        np.testing.assert_array_equal(
            np.asarray(scaled_m[i][:n]), np.asarray(seq_scaled))
        seq_pca = PCATPU(2).fit_transform(seq_scaled)
        np.testing.assert_array_equal(np.asarray(pca_m[i][:n]), seq_pca)
        sil, nh = cluster_scores_tpu(f, labels, shard=False)
        assert scores_m[i][0] == pytest.approx(sil, abs=1e-12)
        assert scores_m[i][1] == pytest.approx(nh, abs=1e-12)


def test_member_tsne_statistically_equivalent(monkeypatch):
    """The vmapped descent lands in the same quality regime as the
    sequential program: comparable KL and comparable embedding-space
    silhouette per member (coordinates are NOT comparable — 250 chaotic
    iterations amplify batched-lowering noise)."""
    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    from sklearn.metrics import silhouette_score

    from vae_los_angeles_tpu.ops.tsne import (
        TSNETPU,
        tsne_fit_transform_members,
    )

    rng = np.random.default_rng(1)
    n, d = 80, 20
    feats = [
        (np.repeat(6.0 * rng.normal(size=(5, d)), n // 5, axis=0)
         + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
        for _ in range(2)
    ]
    labels = np.repeat(np.arange(5), n // 5)
    x = np.stack(feats)
    emb_m, kl_m = tsne_fit_transform_members(x, max_iter=500, perplexity=20)
    for i, f in enumerate(feats):
        t = TSNETPU(2, perplexity=20, max_iter=500, shard=False)
        e = t.fit_transform(f)
        assert np.isfinite(kl_m[i]) and kl_m[i] > 0
        # same KL regime (within 50% of each other)
        assert kl_m[i] == pytest.approx(t.kl_divergence_, rel=0.5)
        sil_m = silhouette_score(emb_m[i], labels)
        sil_s = silhouette_score(e, labels)
        # both embeddings separate the 5 planted clusters comparably
        assert sil_m > 0.3 and sil_s > 0.3
        assert sil_m == pytest.approx(sil_s, abs=0.25)


def test_analyze_cohort_grouped_routes_and_falls_back(monkeypatch, tmp_path):
    import pandas as pd

    from vae_los_angeles_tpu.evaluation.clustering import (
        cluster_imputation_methods as cim,
    )

    class _LE:
        classes_ = np.array(["A", "B", "C", "D", "E"])

        def transform(self, v):
            return np.searchsorted(self.classes_, v)

        def inverse_transform(self, v):
            return self.classes_[v]

    feats, labels = _members(m=2, n=80, d=24, seed=2)
    site_names = _LE().classes_[np.repeat(np.arange(5), 16)]

    def df_for(f):
        return pd.DataFrame({
            "tpm_unstranded": list(f[:, :12]),
            "imputed_beta_value": list(f[:, 12:]),
            "primary_site": site_names,
        })

    entries = [("Mean", df_for(feats[0])), ("KNN", df_for(feats[1]))]

    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    monkeypatch.setenv("CLUSTER_VMAP", "1")
    # the member kernels are single-device programs: simulate a single-chip
    # host (the CI suite runs an 8-device virtual mesh, where the grouped
    # path correctly defers to the sequential auto-sharded kernels)
    from vae_los_angeles_tpu.parallel import vmap_meta

    monkeypatch.setattr(vmap_meta, "population_mesh", lambda devices=None: None)
    grouped = cim.analyze_cohort_grouped(
        entries, _LE(), "ts", "RNA-only", plots_dir=str(tmp_path))
    monkeypatch.setenv("CLUSTER_VMAP", "0")
    sequential = cim.analyze_cohort_grouped(
        entries, _LE(), "ts", "RNA-only", plots_dir=str(tmp_path))
    assert len(grouped) == len(sequential) == 2
    for g, s in zip(grouped, sequential):
        assert g["method"] == s["method"]
        # non-chaotic spaces score identically; t-SNE-space scores land in
        # the same regime (chaotic descent, see the t-SNE test)
        assert g["orig_silhouette"] == pytest.approx(
            s["orig_silhouette"], abs=1e-6)
        assert g["orig_nh"] == pytest.approx(s["orig_nh"], abs=1e-6)
        assert g["pca_silhouette"] == pytest.approx(
            s["pca_silhouette"], abs=1e-6)
        assert g["pca_nh"] == pytest.approx(s["pca_nh"], abs=1e-6)
        assert g["tsne_silhouette"] == pytest.approx(
            s["tsne_silhouette"], abs=0.3)


def test_grouped_falls_back_on_diverging_shapes(monkeypatch, tmp_path):
    """Members with different row counts (a method that filtered rows)
    must take the sequential path, not crash the population stack."""
    import pandas as pd

    from vae_los_angeles_tpu.evaluation.clustering import (
        cluster_imputation_methods as cim,
    )

    class _LE:
        classes_ = np.array(["A", "B", "C", "D", "E"])

        def transform(self, v):
            return np.searchsorted(self.classes_, v)

        def inverse_transform(self, v):
            return self.classes_[v]

    feats, _ = _members(m=2, n=80, d=24, seed=3)
    site_names = _LE().classes_[np.repeat(np.arange(5), 16)]

    def df_for(f, keep):
        return pd.DataFrame({
            "tpm_unstranded": list(f[:keep, :12]),
            "imputed_beta_value": list(f[:keep, 12:]),
            "primary_site": site_names[:keep],
        })

    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    monkeypatch.setenv("CLUSTER_VMAP", "1")
    out = cim.analyze_cohort_grouped(
        [("Mean", df_for(feats[0], 80)), ("KNN", df_for(feats[1], 75))],
        _LE(), "ts", "RNA-only", plots_dir=str(tmp_path))
    assert len(out) == 2 and all(r is not None for r in out)
