"""Host-side image IO: decode/encode + batched directory iteration.

The only host work in the pipeline (JPEG codec + file IO); everything after
decode is device-resident. Uses PIL's native (libjpeg) codec; the optional
C++ loader in native/ parallelizes decode across a thread pool and is used
automatically when built (see mmtrs_tpu.utils.native_loader).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np
from PIL import Image

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def load_image(path: str | Path) -> np.ndarray:
    """Decode to RGB uint8 [H, W, 3]."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def save_jpeg(path: str | Path, img: np.ndarray, quality: int = 95) -> Path:
    """JPEG q95 writer (pipeline.py:49-67 convention)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
        path, "JPEG", quality=quality
    )
    return path


def list_images(d: str | Path) -> list[Path]:
    d = Path(d)
    return sorted(p for p in d.iterdir() if p.suffix.lower() in IMG_EXTS)


def iter_batches(
    paths: list[Path],
    batch_size: int = 16,
    target_hw: tuple[int, int] | None = None,
    min_edge: int = 0,
    use_native: bool = True,
) -> Iterator[tuple[list[Path], np.ndarray, list[Path]]]:
    """Yield (ok_paths, batch [b,H,W,3] uint8, rejected_paths).

    Static batch shapes for jit: images are resized to ``target_hw``
    (default: the batch max size rounded to /8) before stacking. Images with
    min edge < ``min_edge`` are rejected (pipeline.py:80). When a fixed
    ``target_hw`` is given and every file is a JPEG, the C++ threaded loader
    decodes the whole chunk in one call.

    ``rejected_paths`` entries are (path, reason) with reason in
    {"min_edge", "decode_error"}."""
    if target_hw is not None and use_native and all(
        p.suffix.lower() in (".jpg", ".jpeg") for p in paths
    ):
        from mmtrs_tpu.utils import native_loader

        if native_loader.available():
            for s in range(0, len(paths), batch_size):
                chunk = paths[s : s + batch_size]
                batch, status = native_loader.decode_batch(
                    chunk, target_hw, min_edge=min_edge
                )
                ok_mask = status == 0
                ok = [p for p, m in zip(chunk, ok_mask) if m]
                rejected = [
                    (p, "min_edge" if st == 1 else "decode_error")
                    for p, st in zip(chunk, status)
                    if st != 0
                ]
                yield ok, batch[ok_mask], rejected
            return

    for s in range(0, len(paths), batch_size):
        chunk = paths[s : s + batch_size]
        imgs, ok, rejected = [], [], []
        for p in chunk:
            try:
                a = load_image(p)
            except Exception:
                rejected.append((p, "decode_error"))
                continue
            if min_edge and min(a.shape[:2]) < min_edge:
                rejected.append((p, "min_edge"))
                continue
            imgs.append(a)
            ok.append(p)
        if not imgs:
            if rejected:
                yield [], np.zeros((0, 1, 1, 3), np.uint8), rejected
            continue
        if target_hw is None:
            h = max(a.shape[0] for a in imgs)
            w = max(a.shape[1] for a in imgs)
            h, w = ((h + 7) // 8) * 8, ((w + 7) // 8) * 8
        else:
            h, w = target_hw
        batch = np.stack(
            [
                np.asarray(
                    Image.fromarray(a).resize((w, h), Image.BILINEAR), np.uint8
                )
                for a in imgs
            ]
        )
        yield ok, batch, rejected
