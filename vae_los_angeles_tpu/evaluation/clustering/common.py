"""Shared clustering-evaluation helpers: feature assembly, PCA/t-SNE
reduction, 2D scatter plotting, silhouette+NH scoring.

Factored out of the two reference scripts, which duplicate this logic
(``cluster_reconstructed.py:100-253`` and
``cluster_imputation_methods.py:96-255``). The silhouette/NH O(n²·dim)
distance passes (ops/cluster_metrics.py), the scaler→PCA reduction
(ops/pca.py) AND the t-SNE embedding (ops/tsne.py, SURVEY hard-part #7)
route through the MXU per the ``EVAL_BACKEND`` policy (alias ``KNN_BACKEND``):
``auto`` by default — host sklearn below the measured ~1k-row crossover
(reference scale stays reference-exact) and on non-TPU hosts, the device
kernels above it on the chip; ``sklearn``/``tpu`` force a side
(ops/backend.resolve_eval_backend).
"""

from __future__ import annotations

import os

import numpy as np

from vae_los_angeles_tpu.evaluation.clustering.metrics_utils import (
    calculate_neighborhood_hit,
)

# Short labels for the 24 TCGA primary sites (reference
# cluster_imputation_methods.py:34-59)
CLASS_SHORT_LABELS = {
    "Hematopoietic and reticuloendothelial systems": "Hemato",
    "Bronchus and lung": "Lung",
    "Breast": "Breast",
    "Kidney": "Kidney",
    "Brain": "Brain",
    "Colon": "Colon",
    "Corpus uteri": "Corpus",
    "Skin": "Skin",
    "Prostate gland": "Prostate",
    "Stomach": "Stomach",
    "Bladder": "Bladder",
    "Liver and intrahepatic bile ducts": "Liver",
    "Pancreas": "Pancreas",
    "Ovary": "Ovary",
    "Uterus, NOS": "Uterus",
    "Cervix uteri": "Cervix",
    "Esophagus": "Esophagus",
    "Adrenal gland": "Adrenal",
    "Other and ill-defined sites": "Other",
    "Other and unspecified parts of tongue": "Tongue",
    "Connective, subcutaneous and other soft tissues": "Connective",
    "Larynx": "Larynx",
    "Rectum": "Rectum",
    "Other and ill-defined sites in lip, oral cavity and pharynx": "Oral/Pharynx",
}


def prepare_features(df, columns):
    """Concatenate the list-columns named in ``columns`` into one matrix."""
    features = []
    for col in columns:
        if col in df.columns:
            features.append(np.array(df[col].tolist()).astype(np.float32))
    if not features:
        return None
    return np.concatenate(features, axis=1)


def _tpu_backend(n_rows=None) -> bool:
    from vae_los_angeles_tpu.ops.backend import tpu_eval_backend

    return tpu_eval_backend(n_rows)


def perform_dimensionality_reduction(features, method="both", n_components=2,
                                     random_state=42):
    """StandardScaler → PCA(2) and/or t-SNE(2) with PCA-50 preprocessing for
    >50-dim inputs (reference cluster_reconstructed.py:140-187).

    ``KNN_BACKEND=tpu``: scaling + PCA run on device via the Gram-matrix
    formulation (ops/pca.py) — the full-width matrix transfers once (shared
    with the metric kernels' cache) and only 2D/50-dim scores come back —
    and t-SNE runs as the exact-method device program (ops/tsne.py)."""
    from vae_los_angeles_tpu.ops.tsne import resolve_tsne

    TSNE = resolve_tsne(len(features))

    if _tpu_backend(len(features)):
        import jax

        from vae_los_angeles_tpu.ops.pca import PCATPU, device_scaled_features

        features_scaled = device_scaled_features(features)
        pca_cls = PCATPU
        to_host = lambda a: np.asarray(jax.device_get(a))
    else:
        from sklearn.decomposition import PCA as pca_cls
        from sklearn.preprocessing import StandardScaler

        features_scaled = StandardScaler().fit_transform(features)
        to_host = np.asarray
    results = {}
    if method in ("pca", "both"):
        pca = pca_cls(n_components=n_components, random_state=random_state)
        results["pca"] = pca.fit_transform(features_scaled)
        print(f"  PCA explained variance: {pca.explained_variance_ratio_.sum():.4f}")
    if method in ("tsne", "both"):
        if features_scaled.shape[1] > 50:
            n_pre = min(50, *features_scaled.shape)
            features_for_tsne = pca_cls(
                n_components=n_pre, random_state=random_state
            ).fit_transform(features_scaled)
        else:
            features_for_tsne = to_host(features_scaled)
        tsne = TSNE(
            n_components=n_components,
            random_state=random_state,
            perplexity=min(30, len(features) - 1),
        )
        results["tsne"] = tsne.fit_transform(features_for_tsne)
    if method == "both":
        return results["pca"], results["tsne"]
    return results[method]


def analyze_cohort_population(features_list, labels, n_components: int = 2,
                              random_state: int = 42):
    """Member-batched reduction + scoring for M same-shaped feature spaces
    of ONE cohort (the capstone's imputation methods): scaler → PCA(2)
    (+PCA-50 t-SNE preprocessing) → t-SNE → fused silhouette+NH on
    orig/PCA/t-SNE, every stage vmapped over the member axis so the whole
    cohort costs ONE dispatch per stage instead of one per method
    (round-4 verdict item #4; reference
    `src/clustering_evaluation/cluster_imputation_methods.py:479-522` runs
    the methods as a sequential host loop). TPU backend only — callers
    gate on `resolve_eval_backend` and fall back to the sequential path.

    Returns ``[(pca_2d, tsne_2d, scores_dict), ...]`` per member, scores
    in `cluster_scores`' key format."""
    import jax
    import numpy as np_  # shadow-proof alias inside the vmapped path

    from vae_los_angeles_tpu.ops.backend import (
        bucket_rows,
        eval_matmul_precision,
    )
    from vae_los_angeles_tpu.ops.cluster_metrics import (
        cluster_scores_tpu_members,
    )
    from vae_los_angeles_tpu.ops.pca import (
        pca_scores_members,
        standardize_members,
    )
    from vae_los_angeles_tpu.ops.tsne import tsne_fit_transform_members

    import jax.numpy as jnp

    from vae_los_angeles_tpu.ops.knn import _row_padded_put

    m = len(features_list)
    n, d = (int(v) for v in np_.shape(features_list[0]))
    n_pad = bucket_rows(n)
    # per-member padded puts ride the device-put cache (a repeated call on
    # the same host matrices — the A/B pattern — re-transfers nothing; a
    # raw host stack re-shipped ~29 MB over the relay per call and cost
    # more than the batching saved)
    stacked = jnp.stack([
        _row_padded_put(
            f if isinstance(f, (np_.ndarray, jax.Array)) else np_.asarray(
                f, np_.float32),
            n_pad)
        for f in features_list
    ])
    prec = eval_matmul_precision()
    scaled = standardize_members(stacked, np_.int32(n))  # (M, n_pad, d)

    k2 = min(n_components, n, d)
    pca2, evr = pca_scores_members(scaled, np_.int32(n), k2, prec)
    pca2 = np_.asarray(jax.device_get(pca2))[:, :n]
    for i, r in enumerate(np_.asarray(jax.device_get(evr))):
        print(f"  PCA explained variance (member {i}): {r.sum():.4f}")

    scaled_true = scaled[:, :n]
    if d > 50:
        n_pre = min(50, n, d)
        pre, _ = pca_scores_members(scaled, np_.int32(n), n_pre, prec)
        tsne_in = pre[:, :n]  # stays on device — no host round-trip
    else:
        tsne_in = scaled_true
    tsne2, _kl = tsne_fit_transform_members(
        tsne_in, n_components=n_components,
        perplexity=min(30, n - 1),
    )

    if len(np_.unique(labels)) <= 1:
        return [(pca2[i], tsne2[i], None) for i in range(m)]
    orig = cluster_scores_tpu_members(list(scaled_true), labels)
    pca_s = cluster_scores_tpu_members(list(pca2), labels)
    tsne_s = cluster_scores_tpu_members(list(tsne2), labels)
    out = []
    for i in range(m):
        out.append((pca2[i], tsne2[i], {
            "orig_silhouette": orig[i][0], "orig_nh": orig[i][1],
            "pca_silhouette": pca_s[i][0], "pca_nh": pca_s[i][1],
            "tsne_silhouette": tsne_s[i][0], "tsne_nh": tsne_s[i][1],
        }))
    return out


def plot_clusters_2d(features_2d, labels, title, filename, label_encoder=None,
                     figsize=(12, 10), marker_size=50, alpha=0.7):
    """Scatter plot of a 2D embedding colored by primary site."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=figsize)
    cmap = plt.get_cmap("tab20")
    for i, lab in enumerate(np.unique(labels)):
        mask = labels == lab
        if label_encoder is not None:
            name = label_encoder.inverse_transform([lab])[0]
            name = CLASS_SHORT_LABELS.get(name, name)
        else:
            name = str(lab)
        plt.scatter(
            features_2d[mask, 0], features_2d[mask, 1],
            s=marker_size, alpha=alpha, label=name, color=cmap(i % 20),
        )
    plt.xlabel("Component 1", fontsize=12)
    plt.ylabel("Component 2", fontsize=12)
    plt.title(title, fontsize=14, fontweight="bold")
    plt.legend(bbox_to_anchor=(1.05, 1), loc="upper left", frameon=True, fontsize=9)
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    plt.savefig(filename, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"✓ Plot saved to: {filename}")


def cluster_scores(features, labels, pca_features, tsne_features):
    """Silhouette + Neighborhood-Hit on original/PCA/t-SNE spaces
    (reference cluster_reconstructed.py:296-318). ``EVAL_BACKEND=tpu``
    computes each space's PAIR of scores in one fused chunked MXU pass
    (`ops/cluster_metrics.cluster_scores_tpu`) — the orig-space distance
    block is O(n²·dim) at full feature width and is swept once, not twice,
    and the cold run compiles 3 metric programs instead of 6."""
    if len(np.unique(labels)) <= 1:
        return None
    if _tpu_backend(len(features)):
        # scale on device over the same cached put as the reduction step;
        # the full-width matrix never round-trips to host (feature-sharded
        # over the chips on multi-chip hosts)
        from vae_los_angeles_tpu.ops.cluster_metrics import cluster_scores_tpu
        from vae_los_angeles_tpu.ops.pca import device_scaled_features

        scaled = device_scaled_features(features)
        orig_sil, orig_nh = cluster_scores_tpu(scaled, labels)
        pca_sil, pca_nh = cluster_scores_tpu(pca_features, labels)
        tsne_sil, tsne_nh = cluster_scores_tpu(tsne_features, labels)
        return {
            "orig_silhouette": orig_sil,
            "orig_nh": orig_nh,
            "pca_silhouette": pca_sil,
            "pca_nh": pca_nh,
            "tsne_silhouette": tsne_sil,
            "tsne_nh": tsne_nh,
        }
    from sklearn.metrics import silhouette_score
    from sklearn.preprocessing import StandardScaler

    scaled = StandardScaler().fit_transform(features)
    return {
        "orig_silhouette": float(silhouette_score(scaled, labels)),
        "orig_nh": calculate_neighborhood_hit(scaled, labels),
        "pca_silhouette": float(silhouette_score(pca_features, labels)),
        "pca_nh": calculate_neighborhood_hit(pca_features, labels),
        "tsne_silhouette": float(silhouette_score(tsne_features, labels)),
        "tsne_nh": calculate_neighborhood_hit(tsne_features, labels),
    }
