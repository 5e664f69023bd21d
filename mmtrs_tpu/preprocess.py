"""The batched preprocessing pipeline — the hot path of the framework.

Parity with src/preprocessing/pipeline.py ``ImagePreprocessor.process_file``
(order and toggles, :84-116): CLAHE → optional deskew → segmentation crop
(with centre-crop fallback) → 512×512 output; min-edge gate (<400px reject)
happens at decode time on the host (the only dynamic-shape step).

TPU-first: the whole chain is ONE jit-compiled function over an HBM-resident
uint8 batch — vs the reference's per-image OpenCV calls with a
host→device round-trip per image (SURVEY.md §3.1). This function is what
bench.py measures against the ≥5k imgs/s/chip north star.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmtrs_tpu.config import PreprocessConfig
from mmtrs_tpu.models.segmenter import SaliencySegmenter
from mmtrs_tpu.ops.clahe import clahe
from mmtrs_tpu.ops.color import lab_to_rgb, rgb_to_lab
from mmtrs_tpu.ops.deskew import deskew_batch
from mmtrs_tpu.ops.resize import crop_box_resize

try:  # Pallas CLAHE only compiles on real TPU; fall back to XLA elsewhere
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas as _clahe_fast
    from mmtrs_tpu.ops.pallas.lab_kernels import (
        clahe_lab_fused as _lab_fused,
        supports as _lab_fused_ok,
    )
except Exception:  # pragma: no cover
    _clahe_fast = None
    _lab_fused = None


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _clahe_lab_stage(imgs, clahe_clip, tiles, use_pallas):
    """CLAHE on the LAB L channel, uint8-staged output (normalise.py:10-16).

    On TPU this is the fused planar Pallas path (ops/pallas/lab_kernels.py:
    one u8 planarize → forward-LAB kernel → CLAHE kernels → ΔfY backward
    kernel → one u8 interleave — no f32 LAB materialization); elsewhere the
    XLA composition, which doubles as the parity oracle."""
    if (
        use_pallas
        and _lab_fused is not None
        and _lab_fused_ok(imgs.shape[1], imgs.shape[2], tiles)
    ):
        return _lab_fused(imgs, clip=clahe_clip, tiles=tiles)
    x = imgs.astype(jnp.float32)
    lab = rgb_to_lab(x)
    fn = _clahe_fast if (use_pallas and _clahe_fast is not None) else clahe
    l2 = fn(lab[..., 0], clip=clahe_clip, tiles=tiles)
    # quantize the CLAHE output L like cv2 does (saturate_cast<uchar>) —
    # keeps this oracle path bit-comparable with the fused u8 kernels
    l2 = jnp.floor(jnp.clip(l2, 0.0, 255.0) + 0.5)
    x = lab_to_rgb(jnp.concatenate([l2[..., None], lab[..., 1:]], axis=-1))
    return (jnp.clip(x, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)


@partial(
    jax.jit,
    static_argnames=(
        "out_size", "do_crop", "do_rotate", "clahe_clip", "tiles", "use_pallas",
        "segmenter",
    ),
)
def preprocess_batch(
    imgs: jnp.ndarray,
    out_size: int = 512,
    do_crop: bool = True,
    do_rotate: bool = True,
    clahe_clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    crop_margin: float = 15.0,
    use_pallas: bool = False,
    segmenter=None,
):
    """imgs: [B, H, W, 3] uint8/float 0..255 → (out [B,512,512,3] f32,
    info dict with seg_valid / deskew_angle)."""
    # 1. CLAHE on the LAB L channel (normalise.py:10-16); uint8-staged out
    # (cv2.cvtColor LAB2BGR on uint8 returns uint8): quarters the HBM
    # traffic of the deskew/segment/crop passes downstream
    x = _clahe_lab_stage(imgs, clahe_clip, tiles, use_pallas)

    # 2. optional deskew (normalise.py:19-57)
    if do_rotate:
        x, angle = deskew_batch(x)
    else:
        angle = jnp.zeros(x.shape[0])

    # 3. segmentation crop with centre fallback (pipeline.py:84-116);
    # `segmenter` (static) plugs in any Segmenter-protocol proposer — the
    # learned MaskRCNNSegmenter when converted COCO weights exist, the
    # classical saliency proposer otherwise
    if do_crop:
        seg = segmenter if segmenter is not None else SaliencySegmenter()
        boxes, valid = seg.propose_boxes(x)
    else:
        B, H, W, _ = x.shape
        side = float(min(H, W))
        cy0, cx0 = (H - side) / 2.0, (W - side) / 2.0
        boxes = jnp.tile(
            jnp.array([[cy0, cx0, cy0 + side, cx0 + side]]), (x.shape[0], 1)
        )
        valid = jnp.zeros(x.shape[0], bool)
    out = crop_box_resize(x, boxes, out_size, margin=crop_margin)
    return out, {"seg_valid": valid, "deskew_angle": angle, "boxes": boxes}


@partial(
    jax.jit,
    static_argnames=(
        "out_size", "do_rotate", "clahe_clip", "tiles", "use_pallas",
        "segmenter",
    ),
)
def preprocess_augment_batch(
    imgs: jnp.ndarray,
    keys: jnp.ndarray,
    out_size: int = 512,
    do_rotate: bool = True,
    clahe_clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    crop_margin: float = 15.0,
    use_pallas: bool = False,
    segmenter=None,
):
    """The production chain (CLAHE → deskew → segment-crop → ``legacy``
    augment) with the crop resample and the augmentation's geometric warp
    composed into ONE affine resample (ops/resize.crop_warp_fused) — the
    sequential path pays two full-image resamples back to back.

    Randomness/key derivation is identical to ``augment_batch(·,·,"legacy")``
    so outputs are distributionally the same as preprocess_batch followed by
    augment_legacy (boundary blending differs subpixel — see
    crop_warp_fused). Requires square inputs at ``out_size`` (the 512²
    production shape).
    """
    from mmtrs_tpu.ops.augment import legacy_geo_mats, legacy_photometrics
    from mmtrs_tpu.ops.resize import crop_warp_fused

    # Planar route (round 5): between the LAB kernels and the final
    # interleave the batch travels as SEPARATE u8 planes (r, g, b) — no
    # stage-boundary NHWC↔planar transpose passes. Only on real TPU with
    # the fused kernels and a built-in saliency segmenter (a custom
    # Segmenter sees the NHWC contract); the learned Mask R-CNN path and
    # all XLA fallbacks keep the interleaved layout below.
    planar_ok = (
        use_pallas
        and _lab_fused is not None
        and _lab_fused_ok(imgs.shape[1], imgs.shape[2], tiles)
        and segmenter is None
    )
    if planar_ok:
        from mmtrs_tpu.ops.deskew import deskew_batch_planes
        from mmtrs_tpu.ops.resize import crop_warp_fused_planes
        from mmtrs_tpu.ops.warp import _fused_resample_ok

        if _fused_resample_ok(out_size, out_size):
            planes = _lab_fused(imgs, clip=clahe_clip, tiles=tiles,
                                planar_out=True)
            if do_rotate:
                planes, angle = deskew_batch_planes(planes)
            else:
                angle = jnp.zeros(planes[0].shape[0])
            seg = SaliencySegmenter()
            boxes, valid = seg.propose_boxes_planes(planes)
            mats = legacy_geo_mats(keys, out_size, out_size)
            planes = crop_warp_fused_planes(planes, boxes, mats, out_size,
                                            margin=crop_margin)
            out = jnp.stack(planes, axis=-1)  # the ONE chain interleave
            out = legacy_photometrics(out, keys, out_size)
            return out, {"seg_valid": valid, "deskew_angle": angle,
                         "boxes": boxes}

    x = _clahe_lab_stage(imgs, clahe_clip, tiles, use_pallas)

    if do_rotate:
        x, angle = deskew_batch(x)
    else:
        angle = jnp.zeros(x.shape[0])

    seg = segmenter if segmenter is not None else SaliencySegmenter()
    boxes, valid = seg.propose_boxes(x)

    mats = legacy_geo_mats(keys, out_size, out_size)
    # x stays uint8 into the warp: the fused planar resample kernel reads
    # 1-byte pixels (ops/warp._warp_shear_fused); XLA paths promote to f32
    out = crop_warp_fused(x, boxes, mats, out_size, margin=crop_margin)
    out = legacy_photometrics(out, keys, out_size)
    return out, {"seg_valid": valid, "deskew_angle": angle, "boxes": boxes}


def min_edge_ok(shape_hw: tuple[int, int], cfg: PreprocessConfig = PreprocessConfig()) -> bool:
    """Host-side decode gate (pipeline.py:80): reject min edge < 400px."""
    return min(shape_hw) >= cfg.min_edge_px


def preprocess_numpy(
    imgs: np.ndarray, cfg: PreprocessConfig = PreprocessConfig(), segmenter=None
) -> tuple[np.ndarray, dict]:
    """Convenience host API with config object. Returns **uint8** images:
    the cast happens ON DEVICE before the fetch, so the host transfer moves
    1 byte/px instead of 4 (on a remote-TPU tunnel that is the difference
    between ~50 ms and ~200 ms per 512² image; the chain's output is
    uint8-staged anyway — the reference's cv2 pipeline writes uint8 JPEGs)."""
    out, info = preprocess_batch(
        jnp.asarray(imgs),
        out_size=cfg.output_size,
        do_crop=cfg.do_crop,
        do_rotate=cfg.do_rotate,
        clahe_clip=cfg.clahe_clip,
        tiles=cfg.clahe_tiles,
        crop_margin=float(cfg.crop_margin_px),
        use_pallas=_use_pallas(),
        segmenter=segmenter,
    )
    out_u8 = (jnp.clip(out, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    return np.asarray(out_u8), {k: np.asarray(v) for k, v in info.items()}


# ---------------------------------------------------------------------------
# Pipelined host↔device overlap
# ---------------------------------------------------------------------------


def pipelined_run(device_fn, host_batches, depth: int = 2):
    """Run ``device_fn`` over a stream of host batches with 3-stage overlap:

    - the PRODUCER (decode/IO) runs one item ahead on its own thread, so
      batch N+1 decodes while batch N computes;
    - DISPATCH is XLA-async from the calling thread (device_put + the jitted
      call return immediately);
    - D2H FETCH of batch N−1 happens on a fetch thread concurrently with
      batch N's dispatch and batch N+1's decode — the transfer (the
      dominant cost on PCIe/tunnel hosts) no longer serializes the loop.

    ``host_batches``: iterator of (meta, np.ndarray) — all arrays must share
    ONE static shape (pad the tail; a shape change recompiles).
    ``device_fn``: np/jnp array → pytree of device arrays.
    Yields (meta, host_pytree) in input order. ``depth`` bounds in-flight
    batches (device memory = depth × working set).

    Generalizes the reference contrast: segment.py:30 pays a synchronous
    host→device→host round-trip PER IMAGE.
    """
    from concurrent.futures import ThreadPoolExecutor

    def to_host(tree):
        if isinstance(tree, dict):
            return {k: to_host(v) for k, v in tree.items()}
        if isinstance(tree, (tuple, list)):
            return type(tree)(to_host(v) for v in tree)
        return np.asarray(tree)

    it = iter(host_batches)

    def next_item():
        try:
            return next(it)
        except StopIteration:
            return None

    with ThreadPoolExecutor(1) as feeder, ThreadPoolExecutor(1) as fetcher:
        pending: list = []
        nxt = feeder.submit(next_item)
        while True:
            item = nxt.result()
            if item is None:
                break
            nxt = feeder.submit(next_item)  # decode N+1 while N computes
            meta, host = item
            dev = device_fn(jnp.asarray(host))  # async dispatch
            pending.append((meta, fetcher.submit(to_host, dev)))
            if len(pending) >= depth:
                m, f = pending.pop(0)
                yield m, f.result()
        for m, f in pending:
            yield m, f.result()


def preprocess_stream(
    host_batches,
    cfg: PreprocessConfig = PreprocessConfig(),
    segmenter=None,
):
    """Pipelined preprocessing over a stream of (meta, uint8 [B,H,W,3])
    host batches (one static shape — pad the tail). Device-side uint8 cast
    before the fetch (1 byte/px over the wire, not 4). Yields
    (meta, out_u8 [B,512,512,3], info dict of np arrays)."""
    kw = dict(
        out_size=cfg.output_size,
        do_crop=cfg.do_crop,
        do_rotate=cfg.do_rotate,
        clahe_clip=cfg.clahe_clip,
        tiles=cfg.clahe_tiles,
        crop_margin=float(cfg.crop_margin_px),
        use_pallas=_use_pallas(),
        segmenter=segmenter,
    )

    def device_fn(x):
        out, info = preprocess_batch(x, **kw)
        out_u8 = (jnp.clip(out, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
            jnp.uint8
        )
        return out_u8, info

    for meta, (out_u8, info) in pipelined_run(device_fn, host_batches):
        yield meta, out_u8, info
