"""Site-conditioned kNN baseline regressor (reference
``src/models/conditioned_knn.py:5-105``).

Deliberately host-side sklearn: this is a *baseline* the accelerated models
are benchmarked against, not a product path (SURVEY hard-part #7). Behavior
matches the reference:
  * the LAST column of X is the integer site id;
  * one KNeighborsRegressor is fitted per site, with k clamped to the group
    size;
  * prediction groups queries by site and leaves zeros for sites unseen at
    fit time.
"""

from __future__ import annotations

import numpy as np
from sklearn.base import BaseEstimator, RegressorMixin
from sklearn.neighbors import KNeighborsRegressor


class ConditionedKNeighborsRegressor(BaseEstimator, RegressorMixin):
    """kNN regressor conditioned on a categorical site column."""

    def __init__(self, n_neighbors=5, weights="uniform", metric="euclidean"):
        self.n_neighbors = n_neighbors
        self.weights = weights
        self.metric = metric
        self.models = {}
        self.n_features_in_ = None
        self.n_outputs_ = None

    def fit(self, X, y):
        X = np.asarray(X)
        y = np.asarray(y)
        feats, sites = X[:, :-1], X[:, -1].astype(int)
        self.n_features_in_ = feats.shape[1]
        self.unique_sites = np.unique(sites)
        if y.ndim == 1:
            y = y.reshape(-1, 1)
        self.n_outputs_ = y.shape[1]
        self.models = {}
        for site in self.unique_sites:
            mask = sites == site
            group_x, group_y = feats[mask], y[mask]
            k = min(self.n_neighbors, len(group_x))
            if k < 1:
                continue
            knn = KNeighborsRegressor(
                n_neighbors=k, weights=self.weights, metric=self.metric
            )
            knn.fit(group_x, group_y)
            self.models[site] = knn
        return self

    def predict(self, X):
        X = np.asarray(X)
        feats, sites = X[:, :-1], X[:, -1].astype(int)
        predictions = np.zeros((X.shape[0], self.n_outputs_))
        for site in np.unique(sites):
            if site not in self.models:
                # Site unseen at fit time: leave zeros (reference :61-93).
                continue
            mask = sites == site
            predictions[mask] = self.models[site].predict(feats[mask])
        if self.n_outputs_ == 1:
            return predictions.ravel()
        return predictions

    def get_params(self, deep=True):
        return {
            "n_neighbors": self.n_neighbors,
            "weights": self.weights,
            "metric": self.metric,
        }

    def set_params(self, **parameters):
        for parameter, value in parameters.items():
            setattr(self, parameter, value)
        return self
