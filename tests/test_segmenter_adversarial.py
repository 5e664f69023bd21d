"""Adversarial segmenter fixtures (VERDICT round-1 item 6).

The round-1 suite validated the saliency segmenter only on centred,
bright, well-saturated synthetic teeth. These cases probe the tuning where
the reference heuristics (segment.py:33-58) have defined behavior:

- off-centre tooth: the proposal must still cover the tooth;
- two teeth: the proposal must cover at least one tooth, not the gap;
- dark/low-contrast enamel: box must stay sane (inside image, nonempty);
- metallic (gray) restoration filling the scene: mean saturation < 40
  MUST trip the metal gate → centre-crop fallback (valid=False);
- blank/black frame: fallback, never a crash.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from mmtrs_tpu.models.segmenter import SaliencySegmenter

SIZE = 128


def scene(
    centres,
    axes=(0.25, 0.18),
    tooth_rgb=(228, 208, 160),
    bg_rgb=(60, 35, 40),
    noise=4.0,
    seed=0,
):
    """Gum-colored background + one ellipse 'tooth' per centre (fractions
    of the image)."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    img = np.empty((SIZE, SIZE, 3), np.float32)
    img[..., 0], img[..., 1], img[..., 2] = bg_rgb
    img += rng.normal(0, noise, img.shape)
    masks = []
    for fx, fy in centres:
        cx, cy = fx * SIZE, fy * SIZE
        a, b = axes[0] * SIZE, axes[1] * SIZE
        m = ((xs - cx) / a) ** 2 + ((ys - cy) / b) ** 2 <= 1.0
        img[m] = np.array(tooth_rgb, np.float32) + rng.normal(0, noise, (m.sum(), 3))
        masks.append(m)
    return np.clip(img, 0, 255).astype(np.float32), masks


def _box_covers(box, mask, min_frac=0.5) -> bool:
    """At least min_frac of the tooth's pixels inside the proposed box."""
    y0, x0, y1, x1 = [float(v) for v in box]
    ys, xs = np.nonzero(mask)
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    return inside.mean() >= min_frac


@pytest.fixture(scope="module")
def seg():
    return SaliencySegmenter()


def test_centred_tooth_baseline(seg):
    img, masks = scene([(0.5, 0.5)])
    boxes, valid = seg.propose_boxes(jnp.asarray(img[None]))
    assert bool(valid[0])
    assert _box_covers(np.asarray(boxes[0]), masks[0])


@pytest.mark.parametrize("pos", [(0.28, 0.30), (0.72, 0.65), (0.30, 0.70)])
def test_off_centre_tooth_still_covered(seg, pos):
    img, masks = scene([pos])
    boxes, valid = seg.propose_boxes(jnp.asarray(img[None]))
    assert bool(valid[0]), f"off-centre tooth at {pos} rejected"
    assert _box_covers(np.asarray(boxes[0]), masks[0]), (
        f"box {np.asarray(boxes[0])} misses tooth at {pos}"
    )


def test_two_teeth_box_covers_a_tooth(seg):
    img, masks = scene([(0.32, 0.5), (0.68, 0.5)])
    boxes, valid = seg.propose_boxes(jnp.asarray(img[None]))
    assert bool(valid[0])
    box = np.asarray(boxes[0])
    assert _box_covers(box, masks[0], 0.4) or _box_covers(box, masks[1], 0.4), (
        f"box {box} covers neither tooth"
    )


def test_dark_low_contrast_enamel_sane(seg):
    img, masks = scene([(0.5, 0.5)], tooth_rgb=(110, 96, 72), noise=6.0)
    boxes, valid = seg.propose_boxes(jnp.asarray(img[None]))
    box = np.asarray(boxes[0])
    # sane box regardless of the valid verdict: inside image, nonempty
    assert 0 <= box[0] < box[2] <= SIZE
    assert 0 <= box[1] < box[3] <= SIZE
    if bool(valid[0]):
        assert _box_covers(box, masks[0], 0.3)


def test_metallic_scene_trips_saturation_gate(seg):
    """Gray 'metal' region (saturation ≈ 0) as the only bright object: the
    reference's metal gate (mean sat < 40 → reject, segment.py:37-39) must
    fire and fall back to the centre crop."""
    img, _ = scene([(0.5, 0.5)], tooth_rgb=(190, 190, 190), bg_rgb=(55, 52, 50))
    boxes, valid = seg.propose_boxes(jnp.asarray(img[None]))
    assert not bool(valid[0]), "metal region was accepted as a tooth"
    box = np.asarray(boxes[0])
    np.testing.assert_allclose(box, [0, 0, SIZE, SIZE])  # square centre crop


def test_blank_frames_fall_back(seg):
    imgs = jnp.stack(
        [jnp.zeros((SIZE, SIZE, 3)), jnp.full((SIZE, SIZE, 3), 255.0)]
    )
    boxes, valid = seg.propose_boxes(imgs)
    b = np.asarray(boxes)
    assert np.all(b[:, 0] >= 0) and np.all(b[:, 2] <= SIZE)
    assert np.all(b[:, 2] > b[:, 0]) and np.all(b[:, 3] > b[:, 1])
    # white frame is saturation-0 → metal gate must reject it
    assert not bool(valid[1])
