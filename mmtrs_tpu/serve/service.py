"""In-process prediction service — the serving core behind the UI.

Replaces the reference Gradio app's architecture (ui/gradio_app/app.py):
- models load ONCE at startup (app.py:110-155) — preserved;
- preprocessing ran as a per-request `run_pipeline.py` subprocess that
  re-loaded Mask R-CNN every time (utils.py:149-233; the 2-10 s/prediction
  hot spot, README.md:853) — here it is the in-process jit-compiled batch
  pipeline, compiled once;
- MM ensemble: per-fold scaler stats + temperature, tab-absent → scaler
  means → zero standardized vector, 3-way TTA, sigmoid(logit/T) fold mean
  (infer_mm.py:55-109);
- MIL ensemble: bag over all processed images of the case, fold-mean logit
  (infer_mil.py:116-158);
- Tab ensemble: fold-mean GBDT probabilities (tab_model.py:90-122);
- Stacker: LR meta on MM+MIL OOF fit at startup (stack_meta.py:39-57).
  The reference then blends 0.5·img_meta + 0.5·prob_tab instead of using a
  trained 3-stream meta (stack_meta.py:109-127) — both behaviours are
  offered; the unified 3-stream meta is the default (SURVEY.md quirk fix),
  ``legacy_blend=True`` reproduces the shipped 0.5/0.5.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd

from mmtrs_tpu.config import MMJointConfig, PreprocessConfig
from mmtrs_tpu.metrics import choose_threshold
from mmtrs_tpu.models.linear import LogisticRegression
from mmtrs_tpu.serve.choices import FIELD_ORDER, encode_fields, validate_all_or_none


@dataclass
class Stacker:
    """LR meta over stream probabilities (stack_meta.py parity)."""

    meta2: LogisticRegression | None = None  # (mm, mil)
    meta3: LogisticRegression | None = None  # (tab, mm, mil)
    thresholds: dict = field(default_factory=dict)

    @staticmethod
    def fit(oof_mm: pd.DataFrame, oof_mil: pd.DataFrame,
            oof_tab: pd.DataFrame | None = None) -> "Stacker":
        st = Stacker()
        m = oof_mm.rename(columns={"prob": "prob_mm"}).merge(
            oof_mil.rename(columns={"prob": "prob_mil"}), on=["image_name", "y"]
        )
        y = m["y"].astype(int).to_numpy()
        st.meta2 = LogisticRegression(penalty="l2", max_iter=1000).fit(
            m[["prob_mm", "prob_mil"]].to_numpy(), y
        )
        p2 = st.meta2.predict_proba(m[["prob_mm", "prob_mil"]].to_numpy())[:, 1]
        st.thresholds = {
            mode: choose_threshold(y, p2, mode) for mode in
            ("max_f1", "max_acc", "youden")
        }
        if oof_tab is not None:
            m3 = m.merge(oof_tab.rename(columns={"prob": "prob_tab"}),
                         on=["image_name", "y"])
            y3 = m3["y"].astype(int).to_numpy()
            st.meta3 = LogisticRegression(penalty="l2", max_iter=1000).fit(
                m3[["prob_tab", "prob_mm", "prob_mil"]].to_numpy(), y3
            )
        return st

    def fuse(self, prob_mm: float, prob_mil: float,
             prob_tab: float | None = None, legacy_blend: bool = False) -> float:
        p_img = float(
            self.meta2.predict_proba(np.array([[prob_mm, prob_mil]]))[:, 1][0]
        )
        if prob_tab is None:
            return p_img
        if legacy_blend or self.meta3 is None:
            return 0.5 * p_img + 0.5 * prob_tab  # shipped UI behaviour
        return float(
            self.meta3.predict_proba(np.array([[prob_tab, prob_mm, prob_mil]]))[:, 1][0]
        )


def serve_bucket_shape(h: int, w: int, min_edge: int = 512,
                       max_edge: int = 1024, grain: int = 16) -> tuple[int, int]:
    """Canonical working shape for an upload: aspect-preserving scale so the
    min edge is ``min_edge`` (long edge capped at ``max_edge``), then each
    dim snapped to the nearest multiple of ``grain`` (≤1% aspect distortion).

    Why: under XLA every distinct input shape compiles a fresh program —
    native-resolution serving (the reference's per-image cv2/torch path has
    no such cost, pipeline.py:60+) would pay a multi-second compile per
    novel camera resolution. Bucketing bounds the compile set to ~
    (max_edge−min_edge)/grain shapes, each compiled once and persistently
    cached, while keeping ≥512px on the short edge — the same floor the
    resolution gate enforces (utils.py:20-24)."""
    s = min_edge / min(h, w)
    hs, ws = h * s, w * s
    if max(hs, ws) > max_edge:
        s *= max_edge / max(hs, ws)
        hs, ws = h * s, w * s
    snap = lambda v: max(grain, int(round(v / grain)) * grain)
    return snap(hs), snap(ws)


class PredictService:
    """End-to-end case prediction: preprocess → streams → stack → label."""

    def __init__(
        self,
        mm_predict=None,       # callable([imgs],[tab or None]) -> prob
        mil_predict=None,      # callable([imgs]) -> prob
        tab_predict=None,      # callable([9 features]) -> prob
        stacker: Stacker | None = None,
        preprocess_cfg: PreprocessConfig = PreprocessConfig(),
        min_resolution: int = 512,
        legacy_blend: bool = False,
        bucket_shapes: bool = True,
    ):
        self.mm_predict = mm_predict
        self.mil_predict = mil_predict
        self.tab_predict = tab_predict
        self.stacker = stacker
        self.cfg = preprocess_cfg
        self.min_resolution = min_resolution
        self.legacy_blend = legacy_blend
        self.bucket_shapes = bucket_shapes

    # -- pipeline ------------------------------------------------------------

    def preprocess(self, image: np.ndarray) -> np.ndarray:
        from mmtrs_tpu.preprocess import preprocess_numpy

        if self.bucket_shapes:
            h, w = image.shape[:2]
            bh, bw = serve_bucket_shape(h, w)
            if (h, w) != (bh, bw):
                from PIL import Image

                image = np.asarray(
                    Image.fromarray(image.astype(np.uint8)).resize(
                        (bw, bh), Image.BILINEAR
                    )
                )
        out, _ = preprocess_numpy(image[None], self.cfg)
        return out[0]

    def predict_one(
        self,
        image: np.ndarray,
        fields: dict[str, str | None] | None = None,
        thr_mode: str = "max_f1",
        threshold: float | None = None,
    ) -> dict:
        # resolution gate ≥512 (app.py:272-274 / utils.py:20-24)
        if min(image.shape[:2]) < self.min_resolution:
            return {
                "error": f"image resolution too low "
                         f"(min edge {min(image.shape[:2])} < {self.min_resolution})"
            }
        # all-or-none tabular contract (app.py:298-318)
        fields = fields or {}
        use_tab, missing = validate_all_or_none(fields)
        if missing:
            return {"error": f"provide all tabular fields or none; missing: {missing}"}

        # ship the upload as-is (uint8 for JPEG/PNG uploads): the chain
        # accepts uint8 and the H2D transfer moves 1 byte/px instead of 4
        proc = self.preprocess(np.ascontiguousarray(image))

        streams: dict[str, float] = {}
        tab_vec = encode_fields(fields) if use_tab else None
        if self.mm_predict is not None:
            streams["prob_mm"] = float(self.mm_predict(proc, tab_vec))
        if self.mil_predict is not None:
            streams["prob_mil"] = float(self.mil_predict(proc))
        if use_tab and self.tab_predict is not None:
            streams["prob_tab"] = float(self.tab_predict(tab_vec))

        if not streams:
            return {"error": "no model streams available"}

        if self.stacker is not None and "prob_mm" in streams and "prob_mil" in streams:
            p = self.stacker.fuse(
                streams["prob_mm"], streams["prob_mil"],
                streams.get("prob_tab"), legacy_blend=self.legacy_blend,
            )
            thr = (
                threshold
                if threshold is not None
                else self.stacker.thresholds.get(thr_mode, 0.5)
            )
        else:  # graceful degradation: mean of whatever is available
            p = float(np.mean(list(streams.values())))
            thr = threshold if threshold is not None else 0.5

        return {
            "label": "Indirect" if p >= thr else "Direct",
            "p_indirect": float(p),
            "threshold": float(thr),
            "thr_mode": thr_mode,
            "streams": streams,
            "used_tabular": use_tab,
            "processed_image": proc,
        }
