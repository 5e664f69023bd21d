"""Generate real-OpenCV golden arrays for kernel parity tests.

Round-1 validated the CLAHE/warp/deskew kernels against hand-written numpy
re-implementations of OpenCV's algorithms — a shared misconception would
pass silently. This script runs wherever cv2 exists and commits the actual
cv2 outputs as tests/goldens/cv2_goldens.npz, so parity is pinned to the
real library (reference semantics: src/preprocessing/normalise.py:10-57,
segment.py:60-82).

Inputs are seeded and stored alongside outputs. Regenerate with:
    python scripts/make_cv2_goldens.py
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "tests" / "goldens" / "cv2_goldens.npz"


def _smooth_noise(rng: np.random.Generator, h: int, w: int, c: int | None = None) -> np.ndarray:
    """Band-limited random image (uint8) — structured enough for CLAHE/warp
    to produce non-trivial output, no high-frequency aliasing traps."""
    shape = (h // 4, w // 4) if c is None else (h // 4, w // 4, c)
    small = rng.uniform(0, 255, shape).astype(np.float32)
    import cv2

    big = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(big, 0, 255).astype(np.uint8)


def _bar_image(angle_deg: float, size: int = 128) -> np.ndarray:
    """Bright bar at `angle_deg` from vertical on dark background (the
    synthetic deskew fixture shared with tests/test_ops.py)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy = cx = (size - 1) / 2
    t = np.deg2rad(angle_deg)
    d = np.abs((xx - cx) * np.cos(t) - (yy - cy) * np.sin(t))
    img = np.where(d < size * 0.06, 220.0, 30.0)
    return img.astype(np.uint8)


def reference_deskew_angle(img_bgr: np.ndarray) -> float | None:
    """The reference's skew estimate (normalise.py:19-45) with real cv2:
    Canny(50,150) → PCA of edge-point covariance → principal-axis angle."""
    import cv2

    gray = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2GRAY) if img_bgr.ndim == 3 else img_bgr
    edges = cv2.Canny(gray, 50, 150)
    ys, xs = np.nonzero(edges)
    if len(xs) < 10:
        return None
    pts = np.stack([xs, ys], axis=1).astype(np.float64)
    pts -= pts.mean(axis=0)
    cov = pts.T @ pts / len(pts)
    evals, evecs = np.linalg.eigh(cov)
    v = evecs[:, np.argmax(evals)]
    return float(np.degrees(np.arctan2(v[1], v[0])))


def main() -> None:
    import cv2

    rng = np.random.default_rng(1234)
    g: dict[str, np.ndarray] = {}

    # --- CLAHE on a single channel (normalise.py:12-14 semantics) ---------
    L = np.stack([_smooth_noise(rng, 64, 64) for _ in range(2)])
    g["clahe_in"] = L
    c88 = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
    c44 = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(4, 4))
    g["clahe_out_8x8"] = np.stack([c88.apply(im) for im in L])
    g["clahe_out_4x4"] = np.stack([c44.apply(im) for im in L])

    # --- full apply_clahe: BGR→LAB, CLAHE on L, →BGR (normalise.py:10-16) -
    bgr = _smooth_noise(rng, 64, 64, 3)
    g["apply_clahe_in_bgr"] = bgr
    lab = cv2.cvtColor(bgr, cv2.COLOR_BGR2LAB)
    l2 = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(lab[..., 0])
    lab2 = np.stack([l2, lab[..., 1], lab[..., 2]], axis=-1)
    g["apply_clahe_out_bgr"] = cv2.cvtColor(lab2, cv2.COLOR_LAB2BGR)

    # --- LAB conversion itself (float path for color.py parity) -----------
    g["lab_float"] = cv2.cvtColor(
        (bgr[..., ::-1].astype(np.float32) / 255.0), cv2.COLOR_RGB2LAB
    )

    # --- warpAffine rotation, INTER_LINEAR + BORDER_REPLICATE -------------
    wa_in = _smooth_noise(rng, 64, 64).astype(np.float32)
    g["warp_in"] = wa_in
    for name, ang in [("rot7", 7.3), ("rot20", -20.0)]:
        M = cv2.getRotationMatrix2D(((64 - 1) / 2, (64 - 1) / 2), ang, 1.0)
        g[f"warp_M_{name}"] = M.astype(np.float32)
        g[f"warp_out_{name}"] = cv2.warpAffine(
            wa_in, M, (64, 64), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE
        )

    # --- cv2.resize INTER_LINEAR (segment.py:79, pipeline.py:27 use the
    #     default interpolation) -------------------------------------------
    rs_in = _smooth_noise(rng, 48, 48, 3).astype(np.float32)
    g["resize_in"] = rs_in
    g["resize_up_96"] = cv2.resize(rs_in, (96, 96), interpolation=cv2.INTER_LINEAR)
    g["resize_down_24"] = cv2.resize(rs_in, (24, 24), interpolation=cv2.INTER_LINEAR)

    # --- reference deskew: Canny+PCA angles on bar fixtures ---------------
    angles_in, angles_out = [], []
    for ang in [-20.0, -7.0, 7.0, 20.0]:
        est = reference_deskew_angle(_bar_image(ang))
        angles_in.append(ang)
        angles_out.append(np.nan if est is None else est)
    g["deskew_bar_angles"] = np.array(angles_in, np.float32)
    g["deskew_cv2_estimates"] = np.array(angles_out, np.float32)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes) with keys: {sorted(g)}")
    print("cv2 version:", cv2.__version__)


if __name__ == "__main__":
    main()
