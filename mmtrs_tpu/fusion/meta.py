"""L1 logistic meta-stacker (src/fusion/meta_learner.py:5-28 parity),
backed by the JAX proximal-gradient solver instead of liblinear."""

from __future__ import annotations

import numpy as np

from mmtrs_tpu.models.linear import LogisticRegression


class MetaStacker:
    """L1-regularized logistic meta-learner; harmful streams are auto-dropped
    by the sparsity, and ``weights_`` exposes the clipped/normalized view."""

    def __init__(self, C: float = 1.0):
        self.model = LogisticRegression(penalty="l1", C=C, max_iter=5000)

    def fit(self, P, y) -> "MetaStacker":
        self.model.fit(np.asarray(P, dtype=float), np.asarray(y).astype(int))
        return self

    def predict_proba(self, P) -> np.ndarray:
        return np.clip(self.model.predict_proba(np.asarray(P, dtype=float))[:, 1], 0, 1)

    @property
    def weights_(self) -> list[float]:
        return self.model.weights_simplex.tolist()
