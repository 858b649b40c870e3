"""Shared clustering-evaluation helpers: feature assembly, PCA/t-SNE
reduction, 2D scatter plotting, silhouette+NH scoring.

Factored out of the two reference scripts, which duplicate this logic
(``cluster_reconstructed.py:100-253`` and
``cluster_imputation_methods.py:96-255``). Everything defaults to
host-side sklearn (reference-exact); ``KNN_BACKEND=tpu`` routes the
silhouette/NH O(n²·dim) distance passes (ops/cluster_metrics.py), the
scaler→PCA reduction (ops/pca.py) AND the t-SNE embedding (ops/tsne.py,
SURVEY hard-part #7) through the MXU.
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
