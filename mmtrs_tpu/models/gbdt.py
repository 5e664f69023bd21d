"""Histogram gradient-boosted decision trees, TPU-native.

Functional replacement for the reference's XGBoost / LightGBM heads
(models/xgboost_model.py:152-163, models/lightgbm_model.py:98-111,
experiments/fusion_v1/stack_blend.py:134-147) with no C++ model in the loop.

Design (XLA-first, no dynamic shapes):
- Features are quantile-binned once on the host (max_bins ≤ 256); training
  consumes int32 bin indices.
- Trees are grown **level-wise to a static depth**: every sample carries a
  node id; per-(node, feature, bin) gradient/hessian histograms come from one
  ``segment_sum`` per level; split selection is an argmax over the whole
  (node, feature, bin) lattice. Nodes that fail min-child-weight / gamma
  simply route all samples left, which makes the tree arrays perfectly
  rectangular — no ragged structures anywhere.
- The boosting loop is a single ``lax.scan`` over trees; the whole fit is one
  XLA program. Early stopping is implemented as *best-iteration selection*:
  the scan always runs ``n_estimators`` rounds, the per-round validation loss
  is recorded, and prediction uses the best prefix (same semantics as
  xgboost's ``best_iteration``; the reference's patience rule can only stop
  earlier, never pick a better round).
- Inference is a vectorized gather-walk down the static-depth trees — ideal
  for TPU serving (the whole forest is a few small int/float arrays in HBM).

Objectives:
- ``binary_logistic`` — grad = p−y, hess = p(1−p)  (XGBClassifier parity)
- ``soft_regression`` — L2 on a continuous target in [0,1], matching the
  LightGBM *regressor on p_indirect* recipe (lightgbm_model.py:79-80).

Supports sample weights, class balancing, subsample/colsample, L1/L2
regularization, gamma, min_child_weight, and monotone constraints
(xgboost_model.py:30,162-163).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mmtrs_tpu.config import GBDTConfig

# ---------------------------------------------------------------------------
# Binning (host-side, once)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BinSpec:
    """Per-feature bin edges; bin index = searchsorted(edges, x, 'right')."""

    edges: tuple[np.ndarray, ...]  # each [n_edges_f] float32

    @property
    def n_features(self) -> int:
        return len(self.edges)


def fit_bins(X: np.ndarray, max_bins: int = 64) -> BinSpec:
    X = np.asarray(X, dtype=np.float32)
    edges = []
    for f in range(X.shape[1]):
        col = X[:, f]
        col = col[np.isfinite(col)]
        uniq = np.unique(col)
        if uniq.size <= 1:
            edges.append(np.empty(0, dtype=np.float32))
            continue
        if uniq.size <= max_bins:
            cuts = (uniq[:-1] + uniq[1:]) / 2.0
        else:
            qs = np.quantile(col, np.linspace(0, 1, max_bins + 1)[1:-1])
            cuts = np.unique(qs)
        edges.append(cuts.astype(np.float32))
    return BinSpec(tuple(edges))


def apply_bins(X: np.ndarray, spec: BinSpec) -> np.ndarray:
    X = np.asarray(X, dtype=np.float32)
    out = np.zeros(X.shape, dtype=np.int32)
    for f, e in enumerate(spec.edges):
        if e.size:
            out[:, f] = np.searchsorted(e, X[:, f], side="right")
    return out


# ---------------------------------------------------------------------------
# Forest container
# ---------------------------------------------------------------------------


@dataclass
class Forest:
    """Rectangular forest arrays. n_nodes = 2^depth − 1 internal slots."""

    split_feat: jnp.ndarray  # [T, n_nodes] int32
    split_bin: jnp.ndarray  # [T, n_nodes] int32 (go left iff bin <= split_bin)
    leaf_value: jnp.ndarray  # [T, 2^depth] float32 (learning rate folded in)
    depth: int
    base_score: float
    n_trees_used: int
    objective: str
    bin_edges: tuple[np.ndarray, ...]
    val_history: np.ndarray | None = None

    def save(self, path: str | Path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path.with_suffix(".npz"),
            split_feat=np.asarray(self.split_feat),
            split_bin=np.asarray(self.split_bin),
            leaf_value=np.asarray(self.leaf_value),
            val_history=(
                self.val_history if self.val_history is not None else np.empty(0)
            ),
            **{f"edges_{i}": e for i, e in enumerate(self.bin_edges)},
        )
        meta = {
            "depth": self.depth,
            "base_score": self.base_score,
            "n_trees_used": self.n_trees_used,
            "objective": self.objective,
            "n_features": len(self.bin_edges),
        }
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
        return path.with_suffix(".npz")

    @staticmethod
    def load(path: str | Path) -> "Forest":
        path = Path(path)
        z = np.load(path.with_suffix(".npz"))
        meta = json.loads(path.with_suffix(".json").read_text())
        edges = tuple(z[f"edges_{i}"] for i in range(meta["n_features"]))
        vh = z["val_history"]
        return Forest(
            split_feat=jnp.asarray(z["split_feat"]),
            split_bin=jnp.asarray(z["split_bin"]),
            leaf_value=jnp.asarray(z["leaf_value"]),
            depth=meta["depth"],
            base_score=meta["base_score"],
            n_trees_used=meta["n_trees_used"],
            objective=meta["objective"],
            bin_edges=edges,
            val_history=vh if vh.size else None,
        )


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def _effective_depth(cfg: GBDTConfig) -> int:
    if cfg.max_depth and cfg.max_depth > 0:
        return int(cfg.max_depth)
    # leaf-wise recipes (num_leaves): nearest power-of-two depth
    return max(1, int(np.ceil(np.log2(max(cfg.num_leaves, 2)))))


def _grad_hess(objective: str, pred_raw, y):
    if objective == "binary_logistic":
        p = jax.nn.sigmoid(pred_raw)
        return p - y, p * (1.0 - p)
    if objective == "soft_regression":
        return pred_raw - y, jnp.ones_like(pred_raw)
    raise ValueError(objective)


def _val_loss(objective: str, pred_raw, y):
    if objective == "binary_logistic":
        return jnp.mean(
            jnp.logaddexp(0.0, pred_raw) - y * pred_raw
        )  # binary CE on logits
    return jnp.mean((pred_raw - y) ** 2)


def _soft_threshold(g, alpha):
    return jnp.sign(g) * jnp.maximum(jnp.abs(g) - alpha, 0.0)


def train_gbdt(
    X_train: np.ndarray,
    y_train: np.ndarray,
    cfg: GBDTConfig,
    sample_weight: np.ndarray | None = None,
    X_val: np.ndarray | None = None,
    y_val: np.ndarray | None = None,
    max_bins: int | None = None,
) -> Forest:
    """Fit a forest. If a validation set is given, ``n_trees_used`` is the
    best-loss prefix (early-stopping equivalent); else all trees are used."""
    spec = fit_bins(X_train, max_bins or cfg.max_bins)
    Xb = jnp.asarray(apply_bins(X_train, spec))
    y = jnp.asarray(np.asarray(y_train, dtype=np.float32))
    n, n_feat = Xb.shape
    B = int(cfg.max_bins if max_bins is None else max_bins)

    w = np.ones(n, dtype=np.float32) if sample_weight is None else np.asarray(
        sample_weight, dtype=np.float32
    )
    w = jnp.asarray(w / max(w.mean(), 1e-12))

    has_val = X_val is not None and y_val is not None
    if has_val:
        Xb_val = jnp.asarray(apply_bins(X_val, spec))
        yv = jnp.asarray(np.asarray(y_val, dtype=np.float32))
    else:  # dummy 1-row val keeps the scan signature static
        Xb_val = Xb[:1]
        yv = y[:1]

    depth = _effective_depth(cfg)
    n_nodes = 2**depth - 1
    n_leaves = 2**depth

    if cfg.objective == "binary_logistic":
        p0 = float(np.clip(np.average(np.asarray(y_train)), 1e-6, 1 - 1e-6))
        base = float(np.log(p0 / (1 - p0)))
    else:
        base = float(np.average(np.asarray(y_train)))

    mono = jnp.asarray(
        (cfg.monotone_constraints or (0,) * n_feat), dtype=jnp.float32
    )[:n_feat]

    lr = cfg.learning_rate
    lam, alpha, gamma, mcw = cfg.reg_lambda, cfg.reg_alpha, cfg.gamma, cfg.min_child_weight

    def grow_tree(g, h, bins, key):
        """One level-wise tree from per-sample grad/hess. Returns tree arrays
        and per-sample leaf assignment."""
        kcol, _ = jax.random.split(key)
        col_keep = (
            jax.random.uniform(kcol, (n_feat,)) < cfg.colsample
            if cfg.colsample < 1.0
            else jnp.ones((n_feat,), dtype=bool)
        )
        # guarantee at least one column
        col_keep = col_keep.at[jnp.argmax(col_keep)].set(True)

        node = jnp.zeros(n, dtype=jnp.int32)  # node id within current level
        split_feat = jnp.zeros((n_nodes,), dtype=jnp.int32)
        split_bin = jnp.full((n_nodes,), B - 1, dtype=jnp.int32)  # default: all left

        for level in range(depth):
            n_level = 2**level
            offset = n_level - 1  # first node index of this level

            def hist_for_feature(fbins):
                idx = node * B + fbins
                hg = jax.ops.segment_sum(g, idx, num_segments=n_level * B)
                hh = jax.ops.segment_sum(h, idx, num_segments=n_level * B)
                return hg.reshape(n_level, B), hh.reshape(n_level, B)

            HG, HH = jax.vmap(hist_for_feature, in_axes=1, out_axes=1)(bins)
            # HG/HH: [n_level, n_feat, B]
            GL = jnp.cumsum(HG, axis=-1)
            HL = jnp.cumsum(HH, axis=-1)
            G = GL[..., -1:]
            H = HL[..., -1:]
            GR = G - GL
            HR = H - HL

            def leaf_w(Gs, Hs):
                return -_soft_threshold(Gs, alpha) / (Hs + lam)

            score = lambda Gs, Hs: _soft_threshold(Gs, alpha) ** 2 / (Hs + lam)
            gain = 0.5 * (score(GL, HL) + score(GR, HR) - score(G, H)) - gamma

            valid = (HL >= mcw) & (HR >= mcw) & col_keep[None, :, None]
            # monotone constraints: +1 needs wL <= wR, −1 needs wL >= wR
            wL, wR = leaf_w(GL, HL), leaf_w(GR, HR)
            mono_ok = jnp.where(
                mono[None, :, None] > 0,
                wL <= wR,
                jnp.where(mono[None, :, None] < 0, wL >= wR, True),
            )
            gain = jnp.where(valid & mono_ok, gain, -jnp.inf)
            # never split on the last bin (empty right child)
            gain = gain.at[..., B - 1].set(-jnp.inf)

            flat = gain.reshape(n_level, -1)
            best = jnp.argmax(flat, axis=-1)
            best_gain = jnp.take_along_axis(flat, best[:, None], axis=-1)[:, 0]
            bf = (best // B).astype(jnp.int32)
            bb = (best % B).astype(jnp.int32)
            do_split = best_gain > 0.0
            bf = jnp.where(do_split, bf, 0)
            bb = jnp.where(do_split, bb, B - 1)  # all-left when not splitting

            split_feat = jax.lax.dynamic_update_slice(split_feat, bf, (offset,))
            split_bin = jax.lax.dynamic_update_slice(split_bin, bb, (offset,))

            fbin = jnp.take_along_axis(bins, bf[node][:, None], axis=1)[:, 0]
            go_right = fbin > bb[node]
            node = node * 2 + go_right.astype(jnp.int32)

        # leaf values
        LG = jax.ops.segment_sum(g, node, num_segments=n_leaves)
        LH = jax.ops.segment_sum(h, node, num_segments=n_leaves)
        leaf = -lr * _soft_threshold(LG, alpha) / (LH + lam)
        return split_feat, split_bin, leaf, node

    def traverse(split_feat, split_bin, bins_q):
        """Leaf index for each row of bins_q under one tree."""
        nq = bins_q.shape[0]
        node = jnp.zeros(nq, dtype=jnp.int32)
        for level in range(depth):
            offset = 2**level - 1
            f = split_feat[offset + node]
            b = split_bin[offset + node]
            fbin = jnp.take_along_axis(bins_q, f[:, None], axis=1)[:, 0]
            node = node * 2 + (fbin > b).astype(jnp.int32)
        return node

    def scan_body(carry, key):
        pred_tr, pred_va = carry
        g, h = _grad_hess(cfg.objective, pred_tr, y)
        if cfg.subsample < 1.0:
            ksub, key = jax.random.split(key)
            keep = (
                jax.random.uniform(ksub, (n,)) < cfg.subsample
            ).astype(jnp.float32)
        else:
            keep = jnp.ones((n,), dtype=jnp.float32)
        sw = w * keep
        sf, sb, leaf, node_tr = grow_tree(g * sw, h * sw, Xb, key)
        pred_tr = pred_tr + leaf[node_tr]
        node_va = traverse(sf, sb, Xb_val)
        pred_va = pred_va + leaf[node_va]
        vloss = _val_loss(cfg.objective, pred_va, yv)
        return (pred_tr, pred_va), (sf, sb, leaf, vloss)

    keys = jax.random.split(jax.random.key(cfg.seed), cfg.n_estimators)
    init = (
        jnp.full((n,), base, dtype=jnp.float32),
        jnp.full((Xb_val.shape[0],), base, dtype=jnp.float32),
    )
    (_, _), (SF, SB, LV, VL) = jax.lax.scan(jax.jit(scan_body), init, keys)

    vl = np.asarray(VL)
    n_used = int(np.argmin(vl)) + 1 if has_val and cfg.early_stopping_rounds else cfg.n_estimators

    return Forest(
        split_feat=SF,
        split_bin=SB,
        leaf_value=LV,
        depth=depth,
        base_score=base,
        n_trees_used=n_used,
        objective=cfg.objective,
        bin_edges=spec.edges,
        val_history=vl if has_val else None,
    )


# ---------------------------------------------------------------------------
# Inference (vectorized gather-walk; jit-able, TPU serving path)
# ---------------------------------------------------------------------------


def _predict_raw_binned(
    split_feat, split_bin, leaf_value, depth: int, bins_q, n_trees: int, base: float
):
    def one_tree(carry, tree):
        sf, sb, lv = tree
        node = jnp.zeros(bins_q.shape[0], dtype=jnp.int32)
        for level in range(depth):
            offset = 2**level - 1
            f = sf[offset + node]
            b = sb[offset + node]
            fbin = jnp.take_along_axis(bins_q, f[:, None], axis=1)[:, 0]
            node = node * 2 + (fbin > b).astype(jnp.int32)
        return carry + lv[node], None

    trees = (split_feat[:n_trees], split_bin[:n_trees], leaf_value[:n_trees])
    init = jnp.full((bins_q.shape[0],), base, dtype=jnp.float32)
    out, _ = jax.lax.scan(one_tree, init, trees)
    return out


def predict_raw(forest: Forest, X: np.ndarray) -> np.ndarray:
    spec = BinSpec(forest.bin_edges)
    bins_q = jnp.asarray(apply_bins(np.asarray(X, dtype=np.float32), spec))
    out = _predict_raw_binned(
        forest.split_feat,
        forest.split_bin,
        forest.leaf_value,
        forest.depth,
        bins_q,
        forest.n_trees_used,
        forest.base_score,
    )
    return np.asarray(out)


def predict_proba(forest: Forest, X: np.ndarray) -> np.ndarray:
    raw = predict_raw(forest, X)
    if forest.objective == "binary_logistic":
        p = 1.0 / (1.0 + np.exp(-raw))
    else:  # soft regression clipped to [0,1] (LGBMProbWrapper parity,
        # lightgbm_model.py:37-49)
        p = np.clip(raw, 0.0, 1.0)
    return p


# ---------------------------------------------------------------------------
# Reference training recipes (sample-weight policies)
# ---------------------------------------------------------------------------


def consensus_sample_weights(
    weight: np.ndarray,
    y: np.ndarray,
    consensus_power: float,
    class_balanced: bool,
) -> np.ndarray:
    """w^p × balanced class weights, mean-normalized
    (xgboost_model.py:131-135)."""
    w = np.power(np.clip(np.asarray(weight, dtype=np.float64), 0, None), consensus_power)
    if class_balanced:
        y = np.asarray(y).astype(int)
        n = y.size
        for cls in (0, 1):
            m = y == cls
            if m.any():
                w[m] *= n / (2.0 * m.sum())
    return (w / max(w.mean(), 1e-12)).astype(np.float32)
