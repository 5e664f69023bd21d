"""Image ops: color conversions, warps, resize/crop geometry, CLAHE, deskew."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmtrs_tpu.ops import (
    rgb_to_lab,
    lab_to_rgb,
    rgb_to_hsv,
    hsv_to_rgb,
    rgb_to_gray,
    warp_affine,
    rotation_matrix,
    resize_bilinear,
    center_crop_resize,
    crop_box_resize,
    clahe,
    clahe_rgb,
    deskew_batch,
    estimate_skew_angle,
)
from mmtrs_tpu.ops.resize import mask_to_box
from tests.synth import synth_images


# --------------------------- color ------------------------------------------


def test_lab_known_values():
    # white → L=100 (scaled 255), a=b≈128; black → L=0
    white = jnp.full((1, 1, 1, 3), 255.0)
    black = jnp.zeros((1, 1, 1, 3))
    lw = rgb_to_lab(white)[0, 0, 0]
    lb = rgb_to_lab(black)[0, 0, 0]
    assert lw[0] == pytest.approx(255.0, abs=1.0)
    assert lw[1] == pytest.approx(128.0, abs=1.0)
    assert lw[2] == pytest.approx(128.0, abs=1.0)
    assert lb[0] == pytest.approx(0.0, abs=1e-3)
    # mid-gray pins the sRGB gamma: L*(128) = 53.58 (cv2 5.0), not the
    # linear-RGB 76.2
    gray = jnp.full((1, 1, 1, 3), 128.0)
    assert rgb_to_lab(gray)[0, 0, 0, 0] == pytest.approx(
        53.582764 * 255.0 / 100.0, abs=0.2
    )


def test_lab_roundtrip():
    imgs = jnp.asarray(synth_images(4, 32, seed=0).astype(np.float32))
    back = lab_to_rgb(rgb_to_lab(imgs))
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1.0)


def test_hsv_roundtrip_and_ranges():
    imgs = jnp.asarray(synth_images(4, 32, seed=1).astype(np.float32))
    hsv = rgb_to_hsv(imgs)
    assert float(hsv[..., 0].max()) < 180.0
    assert float(hsv[..., 1].max()) <= 255.0
    back = hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1.0)


def test_hsv_known():
    red = jnp.asarray([[[[255.0, 0.0, 0.0]]]])
    h = rgb_to_hsv(red)[0, 0, 0]
    assert h[0] == pytest.approx(0.0)
    assert h[1] == pytest.approx(255.0)
    assert h[2] == pytest.approx(255.0)
    green = jnp.asarray([[[[0.0, 255.0, 0.0]]]])
    assert rgb_to_hsv(green)[0, 0, 0, 0] == pytest.approx(60.0)


def test_gray_weights():
    img = jnp.asarray([[[[100.0, 50.0, 200.0]]]])
    assert rgb_to_gray(img)[0, 0, 0] == pytest.approx(
        0.299 * 100 + 0.587 * 50 + 0.114 * 200
    )


# --------------------------- warp -------------------------------------------


def test_warp_identity():
    imgs = jnp.asarray(synth_images(2, 32, seed=2).astype(np.float32))
    M = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out = warp_affine(imgs, M)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-3)


def test_warp_rotation_90_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.random((1, 16, 16, 1)).astype(np.float32) * 255
    M = rotation_matrix(90.0, (7.5, 7.5))[None]
    out = np.asarray(warp_affine(jnp.asarray(img), M))
    # cv2.getRotationMatrix2D(+90°): dst_x = y, dst_y = -x + (W-1) —
    # verified analytically; equals np.rot90(k=1) on the array axes
    want = np.rot90(img, k=1, axes=(1, 2))
    np.testing.assert_allclose(out, want, atol=1e-2)


def test_warp_translation_replicate_border():
    img = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # shift right by 1 (forward map x→x+1)
    M = jnp.asarray([[[1.0, 0, 1], [0, 1, 0], [0, 0, 1]]])
    out = np.asarray(warp_affine(img, M))[0, :, :, 0]
    want = np.asarray(img)[0, :, :, 0]
    np.testing.assert_allclose(out[:, 1:], want[:, :-1], atol=1e-4)
    np.testing.assert_allclose(out[:, 0], want[:, 0], atol=1e-4)  # replicate


# --------------------------- resize/crop -------------------------------------


def _bilinear_oracle(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Classic half-pixel-centre bilinear (cv2.INTER_LINEAR semantics).
    NB: PIL's BILINEAR is area-averaged on downscale, so PIL is only a valid
    oracle for upscaling."""
    H, W = img.shape[:2]
    ys = np.clip((np.arange(oh) + 0.5) * H / oh - 0.5, 0, H - 1)
    xs = np.clip((np.arange(ow) + 0.5) * W / ow - 0.5, 0, W - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    return (
        img[y0][:, x0] * (1 - wy) * (1 - wx)
        + img[y0][:, x1] * (1 - wy) * wx
        + img[y1][:, x0] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )


def test_resize_matches_bilinear_oracle():
    rng = np.random.default_rng(1)
    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.float32)
    for out_hw in [(16, 16), (64, 64), (24, 40)]:
        out = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))[0]
        want = _bilinear_oracle(img[0], *out_hw)
        np.testing.assert_allclose(out, want, atol=1e-2)


def test_resize_upscale_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(4)
    img = (rng.random((1, 16, 16, 3)) * 255).astype(np.uint8)
    out = np.asarray(resize_bilinear(jnp.asarray(img.astype(np.float32)), (32, 32)))[0]
    pil = Image.fromarray(img[0]).resize((32, 32), Image.BILINEAR)
    np.testing.assert_allclose(out, np.asarray(pil, dtype=np.float32), atol=1.0)


def test_center_crop_resize_square_identity():
    imgs = jnp.asarray(synth_images(2, 32, seed=3).astype(np.float32))
    out = center_crop_resize(imgs, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-3)


def test_mask_to_box_and_crop_geometry():
    mask = np.zeros((64, 64), bool)
    mask[10:30, 20:50] = True
    box = np.asarray(mask_to_box(jnp.asarray(mask)))
    np.testing.assert_array_equal(box, [10, 20, 30, 50])

    # crop_box_resize reproduces the reference numpy geometry
    rng = np.random.default_rng(2)
    img = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    out = np.asarray(
        crop_box_resize(jnp.asarray(img)[None], jnp.asarray(box)[None], 32, margin=15)
    )[0]

    # reference path (segment.py:60-82)
    y0, x0 = max(10 - 15, 0), max(20 - 15, 0)
    y1, x1 = min(30 + 15, 64), min(50 + 15, 64)
    crop = img[y0:y1, x0:x1]
    h, w = crop.shape[:2]
    d = max(h, w)
    padded = np.zeros((d, d, 3), np.float32)
    yo, xo = (d - h) // 2, (d - w) // 2
    padded[yo : yo + h, xo : xo + w] = crop
    want = _bilinear_oracle(padded, 32, 32)
    assert np.mean(np.abs(out - want)) < 3.0  # border-pixel interp diffs only


# --------------------------- CLAHE ------------------------------------------


def _clahe_opencv_oracle(l: np.ndarray, clip=3.0, tiles=(8, 8), n_bins=256):
    """Literal numpy transcription of the OpenCV CLAHE algorithm (integer
    residual redistribution + x·inv_tw−0.5 tile coords, clahe.cpp) used as
    the oracle for the XLA/Pallas versions; itself cross-checked against
    real cv2 outputs in tests/test_cv2_goldens.py."""
    H, W = l.shape
    ty, tx = tiles
    th, tw = H // ty, W // tx
    area = th * tw
    pix = np.clip(np.round(l), 0, n_bins - 1).astype(int)
    luts = np.zeros((ty, tx, n_bins))
    limit = max(int(clip * area / n_bins), 1)
    for i in range(ty):
        for j in range(tx):
            tile = pix[i * th : (i + 1) * th, j * tw : (j + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=n_bins).astype(float)
            excess = int(np.maximum(hist - limit, 0).sum())
            hist = np.minimum(hist, limit)
            hist += excess // n_bins
            residual = excess % n_bins
            if residual:
                step = max(n_bins // residual, 1)
                idx = np.arange(0, n_bins, step)[:residual]
                hist[idx] += 1
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(np.round(cdf * (n_bins - 1) / area), 0, n_bins - 1)
    out = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            fy = y / th - 0.5
            fx = x / tw - 0.5
            y0 = int(np.clip(np.floor(fy), 0, ty - 1))
            x0 = int(np.clip(np.floor(fx), 0, tx - 1))
            y1 = min(y0 + 1, ty - 1)
            x1 = min(x0 + 1, tx - 1)
            wy = np.clip(fy - y0, 0, 1)
            wx = np.clip(fx - x0, 0, 1)
            v = pix[y, x]
            out[y, x] = (
                luts[y0, x0, v] * (1 - wy) * (1 - wx)
                + luts[y0, x1, v] * (1 - wy) * wx
                + luts[y1, x0, v] * wy * (1 - wx)
                + luts[y1, x1, v] * wy * wx
            )
    return out


def test_clahe_matches_oracle():
    rng = np.random.default_rng(3)
    l = (rng.random((2, 32, 32)) * 255).astype(np.float32)
    got = np.asarray(clahe(jnp.asarray(l), clip=3.0, tiles=(4, 4)))
    for b in range(2):
        want = _clahe_opencv_oracle(l[b], clip=3.0, tiles=(4, 4))
        np.testing.assert_allclose(got[b], want, atol=1e-3)


def test_clahe_increases_local_contrast():
    imgs = synth_images(2, 64, seed=4).astype(np.float32)
    # low-contrast version
    low = imgs * 0.25 + 96.0
    out = np.asarray(clahe_rgb(jnp.asarray(low)))
    # clip-limited equalization must widen the luminance distribution
    assert out.std() > low.std() * 1.1, (out.std(), low.std())
    assert out.max() - out.min() > (low.max() - low.min()) * 1.2
    assert out.min() >= 0 and out.max() <= 255


def test_clahe_identity_on_uniform():
    l = jnp.full((1, 32, 32), 128.0)
    out = np.asarray(clahe(l, tiles=(4, 4)))
    assert np.all(np.abs(out - out[0, 0, 0]) < 1e-3)  # stays flat


# --------------------------- deskew ------------------------------------------


def _bar_image(angle_deg: float, size=128) -> np.ndarray:
    """Bright elongated bar rotated by angle (display coords, CCW positive)."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    cx = cy = size / 2
    th = np.deg2rad(angle_deg)
    u = (xs - cx) * np.cos(th) - (ys - cy) * np.sin(th)
    v = (xs - cx) * np.sin(th) + (ys - cy) * np.cos(th)
    mask = (np.abs(u) < size * 0.4) & (np.abs(v) < size * 0.06)
    img = np.full((size, size, 3), 30.0, np.float32)
    img[mask] = 220.0
    return img


@pytest.mark.parametrize("true_angle", [-30.0, 20.0, 40.0])
def test_estimate_skew_angle(true_angle):
    img = _bar_image(true_angle)
    est = float(estimate_skew_angle(jnp.asarray(img)[None])[0])
    # _bar_image rotates in math coords (CCW); the estimator reports
    # atan2(e_y, e_x) in display coords (y down) like the reference, so the
    # expected estimate is -true_angle (mod 180)
    diff = min(abs(est + true_angle), abs(abs(est + true_angle) - 180))
    assert diff < 3.0, (est, true_angle)


def test_deskew_applies_only_above_tolerance():
    img_small = _bar_image(5.0)
    img_big = _bar_image(40.0)
    out, ang = deskew_batch(jnp.asarray(np.stack([img_small, img_big])))
    ang = np.asarray(ang)
    assert ang[0] == 0.0
    assert abs(ang[1]) >= 15.0
    # the rotated big-angle image should now be near-horizontal
    est_after = float(estimate_skew_angle(out[1:2])[0])
    assert min(abs(est_after), abs(abs(est_after) - 180)) < 5.0


def test_deskew_skips_blank():
    blank = jnp.full((1, 64, 64, 3), 128.0)
    _, ang = deskew_batch(blank)
    assert float(ang[0]) == 0.0


def test_fast_color_math_matches_exact_closed_forms():
    """The LAB transcendentals are exact closed forms evaluated in f32
    on-device as exp/log compositions — round 4 made ops/color.py share the
    Pallas kernels' exact forms (diag_lab_r4: Mosaic == XLA:TPU bit-equal on
    them, while XLA's dedicated cbrt/pow lowerings ULP-differ at the L
    quantizer). Pin the on-device evaluation against float64 closed forms at
    sub-level precision so transcendental drift (library lowering changes
    included) can never silently move pixels. Measured maxima — true CPU:
    s2l 6e-8, l2s 1.5e-7, cbrt rel 2e-7. On TPU (MMTRS_TEST_TPU=1 opts the
    suite onto the chip; the conftest default is hermetic CPU) XLA:TPU's
    exp/log carry ~1e-4-class ULP vs the f64 closed forms — the price of
    the cross-platform bit-equality of the quantized L plane (≈0.03 u8
    levels, invisible at the quantizer). Bounds are platform-aware; both
    keep errors far below one u8 level."""
    from mmtrs_tpu.ops.color import _cbrt_fast, _linear_to_srgb, _srgb_to_linear

    on_tpu = jax.devices()[0].platform == "tpu"
    tol_s2l, tol_l2s, tol_cbrt = (
        (8e-4, 4e-4, 4e-4) if on_tpu else (2e-5, 1e-5, 1e-6)
    )

    x = np.linspace(0.0, 1.0, 4097).astype(np.float32)
    lin_exact = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    got = np.asarray(_srgb_to_linear(jnp.asarray(x)))
    assert np.abs(got - lin_exact).max() < tol_s2l

    y = np.linspace(0.0, 1.2, 4097).astype(np.float64)
    srgb_exact = np.where(
        y <= 0.0031308, 12.92 * y, 1.055 * y ** (1 / 2.4) - 0.055
    )
    got = np.asarray(_linear_to_srgb(jnp.asarray(y.astype(np.float32))))
    assert np.abs(got - srgb_exact).max() < tol_l2s

    t = np.linspace(1e-4, 1.5, 4097).astype(np.float64)
    got = np.asarray(_cbrt_fast(jnp.asarray(t.astype(np.float32))))
    rel = np.abs(got - np.cbrt(t)) / np.cbrt(t)
    assert rel.max() < tol_cbrt


def test_crop_warp_fused_identity_matches_crop_box_resize():
    """With identity augment matrices the fused path must reproduce
    crop_box_resize (same sampling coordinates, same mask)."""
    from mmtrs_tpu.ops.resize import crop_box_resize, crop_warp_fused
    from mmtrs_tpu.ops.warp import identity3

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, (3, 512, 512, 3)).astype(np.float32))
    boxes = jnp.asarray(
        [[100.0, 120.0, 400.0, 300.0], [0.0, 0.0, 512.0, 512.0],
         [200.0, 50.0, 280.0, 460.0]]
    )
    mats = jnp.tile(identity3()[None], (3, 1, 1))
    want = np.asarray(crop_box_resize(x, boxes, 512, margin=15.0))
    got = np.asarray(crop_warp_fused(x, boxes, mats, 512, margin=15.0))
    # identical sampling coordinates; residual on CPU is summation-order
    # noise (H-then-V vs V-then-H resample, ~0.014 measured on CPU f32 at
    # 512²). Under MMTRS_TEST_TPU=1 the fused Pallas resample engages and
    # its interp matmul runs at the MXU's default f32 precision
    # (bf16-mantissa passes, ~0.4% rel) — measured max 1.81 levels on-chip
    # r4. A real coordinate bug shows as many whole intensity levels (the
    # round-3 linalg.inv defect measured 6.3 with ~50% of pixels off).
    tol = 2.5 if jax.devices()[0].platform == "tpu" else 0.06
    assert np.abs(got - want).max() < tol


def test_crop_warp_fused_matches_sequential_on_linear_ramp():
    """Bilinear resampling reproduces linear functions exactly, so on a
    linear-ramp image the fused single resample and the sequential
    crop→warp double resample must agree wherever both are >2px inside
    their masks — a sharp check of the affine composition and of the
    combined zero-mask geometry."""
    from mmtrs_tpu.ops.resize import crop_box_resize, crop_warp_fused
    from mmtrs_tpu.ops.warp import rotate3, scale3, translate3, warp_affine_shear

    H = 256
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
    ramp = np.stack([0.3 * xx + 0.1 * yy, 0.2 * xx, 0.4 * yy], axis=-1)
    x = jnp.asarray(ramp[None])
    boxes = jnp.asarray([[40.0, 30.0, 220.0, 200.0]])
    c = ((H - 1) / 2.0, (H - 1) / 2.0)
    m = rotate3(9.0, c) @ scale3(1.07, 1.07, c) @ translate3(6.0, -4.0)
    mats = m[None]

    crop = crop_box_resize(x, boxes, H, margin=15.0)
    seq = np.asarray(warp_affine_shear(crop, mats, border="constant", cval=0.0))[0]
    fused = np.asarray(crop_warp_fused(x, boxes, mats, H, margin=15.0))[0]

    seq_in = (np.abs(seq).sum(-1) > 0)
    fus_in = (np.abs(fused).sum(-1) > 0)
    # mask geometry agrees up to the documented 1px boundary blending
    disagree = seq_in != fus_in
    assert disagree.mean() < 0.02
    # erode the joint interior by 2px and require near-exact values there
    from scipy.ndimage import binary_erosion

    interior = binary_erosion(seq_in & fus_in, iterations=2)
    assert interior.sum() > 1000
    d = np.abs(seq - fused)[interior]
    assert d.max() < 0.35, d.max()


def test_clahe_lab_fused_matches_xla_composition_interpret():
    """The fused planar LAB↔RGB Pallas path (interpret mode on CPU) must
    match the PRODUCTION oracle clahe_rgb(quant_l=True) — i.e. the cv2-u8
    data path: round(rgb_to_lab) → clahe on integer L → integer a,b back
    through lab_to_rgb → uint8 store. The i8 chroma transport IS that
    integer lattice, so under one compiler (interpret mode runs the same
    XLA CPU math) the two paths agree except at f32 round-to-nearest ties,
    which straddle only under differing codegen. Includes saturated random
    colors — the regime where the retired i16 fixed-point transport
    diverged up to ~20 levels from the oracle's integer a/b rounding."""
    import jax.numpy as jnp

    from mmtrs_tpu.ops.clahe import clahe_rgb
    from mmtrs_tpu.ops.pallas.lab_kernels import clahe_lab_fused, supports
    from tests.synth import synth_images

    assert supports(128, 128)
    rng = np.random.default_rng(9)
    imgs = np.concatenate(
        [
            synth_images(2, 128, seed=9),
            rng.integers(0, 256, (2, 128, 128, 3)).astype(np.uint8),
        ]
    )
    got = np.asarray(clahe_lab_fused(jnp.asarray(imgs), interpret=True))

    rgb = clahe_rgb(jnp.asarray(imgs, jnp.float32), quant_l=True)
    want = np.asarray(
        (jnp.clip(rgb, 0, 255) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() >= 0.999, (diff == 0).mean()


def test_shift_rows_pallas_u8_roundtrip_interpret():
    """uint8-in/uint8-out row shift (deskew's 3-shear transport) must equal
    round-half-up of the f32 kernel result."""
    import jax.numpy as jnp

    from mmtrs_tpu.ops.pallas.shift_kernel import shift_rows_pallas

    rng = np.random.default_rng(23)
    rows = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    off = jnp.asarray(rng.uniform(-20, 20, 64).astype(np.float32))
    got = np.asarray(
        shift_rows_pallas(jnp.asarray(rows), off, interpret=True)
    )
    ref = np.asarray(
        shift_rows_pallas(jnp.asarray(rows, jnp.float32), off, interpret=True)
    )
    want = np.floor(np.clip(ref, 0.0, 255.0) + 0.5).astype(np.uint8)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_clahe_pallas_u8_out_matches_oracle_interpret():
    """clahe_pallas(out_dtype=uint8) must equal round-half-up of the XLA
    oracle (cv2's saturate_cast<uchar> CLAHE contract), u8 input accepted
    directly."""
    import jax.numpy as jnp

    from mmtrs_tpu.ops.clahe import clahe
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

    rng = np.random.default_rng(17)
    l_u8 = rng.integers(0, 256, (2, 64, 64)).astype(np.uint8)
    got = np.asarray(
        clahe_pallas(jnp.asarray(l_u8), tiles=(4, 4), interpret=True,
                     out_dtype=jnp.uint8)
    )
    want_f = np.asarray(clahe(jnp.asarray(l_u8, jnp.float32), tiles=(4, 4)))
    want = np.floor(np.clip(want_f, 0.0, 255.0) + 0.5).astype(np.uint8)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_resample_rows_pallas_matches_xla_interpret():
    """Fused shift+interp-matmul kernel (interpret mode) must reproduce
    _resample_rows_affine per axis on uint8 planar rows."""
    import jax.numpy as jnp

    from mmtrs_tpu.ops.pallas.shift_kernel import resample_rows_pallas
    from mmtrs_tpu.ops.warp import _resample_rows_affine

    rng = np.random.default_rng(5)
    B, H, W, C = 2, 32, 128, 3
    imgs = rng.integers(0, 256, (B, H, W, C)).astype(np.float32)
    alpha = jnp.asarray([0.8, -1.1])
    beta = jnp.asarray(rng.uniform(-20, 20, (B, H)).astype(np.float32))
    want = np.asarray(
        _resample_rows_affine(
            jnp.asarray(imgs), alpha, beta,
            precision=__import__("jax").lax.Precision.HIGHEST,
        )
    )

    planar = jnp.asarray(imgs.astype(np.uint8)).transpose(0, 3, 1, 2).reshape(
        B * C * H, W
    )
    r = jnp.mean(beta, axis=1)
    off = beta - r[:, None]
    rep = lambda v, n: jnp.broadcast_to(v[:, None, None], (B, C, n)).reshape(-1)
    got = np.asarray(
        resample_rows_pallas(
            planar, rep3 := jnp.broadcast_to(off[:, None, :], (B, C, H)).reshape(-1),
            rep(alpha, H), rep(r, H), block_rows=32, interpret=True,
        )
    ).reshape(B, C, H, W).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-5)


def test_warp_shear_fused_matches_xla_interpret(monkeypatch):
    """_warp_shear_fused (both passes + transposes) vs the XLA two-pass
    path, full warp matrices, interpret-mode kernels."""
    import jax.numpy as jnp

    import mmtrs_tpu.ops.pallas.shift_kernel as sk
    from mmtrs_tpu.ops import warp as wp

    orig = sk.resample_rows_pallas
    monkeypatch.setattr(
        sk, "resample_rows_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    rng = np.random.default_rng(6)
    B, H, W = 2, 64, 128
    imgs = rng.integers(0, 256, (B, H, W, 3)).astype(np.float32)
    th = np.deg2rad(9.0)
    mats = np.stack([
        np.array([[np.cos(th), -np.sin(th), 6.0],
                  [np.sin(th), np.cos(th), -3.0], [0, 0, 1]], np.float32),
        np.array([[1.05, 0.1, -4.0], [0.02, 0.95, 5.0], [0, 0, 1]], np.float32),
    ])
    a, b, c, d, e, f = wp.invert_affine_params(jnp.asarray(mats))
    e_safe = jnp.where(jnp.abs(e) < 1e-3, 1e-3, e)
    got = np.asarray(
        wp._warp_shear_fused(jnp.asarray(imgs), a, b, c, d, e_safe, f)
    )

    ys_idx = jnp.arange(H, dtype=jnp.float32)[None, :]
    xs_idx = jnp.arange(W, dtype=jnp.float32)[None, :]
    alpha_h = a - b * d / e_safe
    beta_h = (b / e_safe)[:, None] * ys_idx + (c - b * f / e_safe)[:, None]
    tmp = wp._resample_rows_affine(jnp.asarray(imgs), alpha_h, beta_h)
    beta_v = d[:, None] * xs_idx + f[:, None]
    tmpT = jnp.swapaxes(tmp, 1, 2)
    outT = wp._resample_rows_affine(tmpT, e, beta_v)
    want = np.asarray(jnp.swapaxes(outT, 1, 2))
    # 0.55: the fused path stores the inter-pass intermediate as uint8
    # (round-half-up, ≤0.5 level) — the XLA oracle keeps f32 between passes
    np.testing.assert_allclose(got, want, atol=0.55, rtol=1e-5)
    # interior pixels should still be extremely close in aggregate
    assert np.abs(got - want).mean() < 0.2

    # uint8 input → dtype-preserving uint8 output (cv2.warpAffine contract):
    # the kernel's u8 store must equal the chain's round-half-up quantiser
    # applied to the f32 fused result, within the 1-level quantiser slack
    got_u8 = np.asarray(
        wp._warp_shear_fused(
            jnp.asarray(imgs.astype(np.uint8)), a, b, c, d, e_safe, f
        )
    )
    assert got_u8.dtype == np.uint8
    want_u8 = np.floor(np.clip(got, 0.0, 255.0) + 0.5)
    assert np.abs(got_u8.astype(np.int32) - want_u8.astype(np.int32)).max() <= 1


def test_photometrics_fused_uint8_input_matches_oracle_interpret():
    """The fused pointwise photometric kernel now reads uint8 input
    directly; its deterministic rows (bc / hsv / dropout — noise PRNG is
    hardware-only and checked on-chip) must match the XLA oracle on the
    same uint8 input, in interpret mode on CPU."""
    import jax
    import jax.numpy as jnp

    from mmtrs_tpu.ops.augment import photometrics_pointwise_ref
    from mmtrs_tpu.ops.pallas.photometric_kernel import photometrics_fused_pallas

    rng = np.random.default_rng(13)
    B, H, W, hole = 5, 64, 128, 7
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8))
    # rows: identity / bc / hsv / dropout / bc+hsv+dropout
    params = np.zeros((B, 10), np.float32)
    params[1, 0], params[1, 1] = 0.12, -0.09
    params[2, 2:6] = (4.0, -6.0, 8.0, 1.0)
    params[3, 7:10] = (1.0, 20.0, 33.0)
    params[4, 0], params[4, 1] = -0.07, 0.11
    params[4, 2:6] = (-3.0, 9.0, -5.0, 1.0)
    params[4, 7:10] = (1.0, 5.0, 90.0)
    params = jnp.asarray(params)
    keys = jax.vmap(jax.random.key)(jnp.arange(B, dtype=jnp.uint32))
    seeds = jnp.arange(B, dtype=jnp.int32)

    want = np.asarray(photometrics_pointwise_ref(imgs, params, keys, hole))
    got = np.asarray(
        photometrics_fused_pallas(imgs, params, seeds, hole, interpret=True)
    )
    assert got.dtype == np.uint8
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # interpret-mode CPU transcendentals straddle the .5 quantiser boundary
    # slightly more often than on-chip (the TPU test pins 0.9999)
    assert (diff == 0).mean() >= 0.999, (diff == 0).mean()


def test_scatter_rows_pallas_interpret():
    """In-place Pallas row scatter (round 5, subset_apply's scatter-back):
    indexed rows land bit-exactly, every other row is byte-identical —
    the aliased destination buffer is never touched there."""
    import jax.numpy as jnp

    from mmtrs_tpu.ops.pallas.scatter_kernel import (
        scatter_rows_pallas,
        scatter_rows_supported,
    )

    rng = np.random.default_rng(7)
    dst = jnp.asarray(rng.integers(0, 256, (8, 32, 128, 3)).astype(np.uint8))
    sub = jnp.asarray(rng.integers(0, 256, (3, 32, 128, 3)).astype(np.uint8))
    idx = jnp.asarray(np.array([5, 1, 6], np.int32))
    got = np.asarray(scatter_rows_pallas(dst, sub, idx, interpret=True))
    want = np.asarray(dst).copy()
    want[[5, 1, 6]] = np.asarray(sub)
    np.testing.assert_array_equal(got, want)

    # f32 planes path
    dstf = jnp.asarray(rng.normal(size=(4, 16, 128)).astype(np.float32))
    subf = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
    got = np.asarray(
        scatter_rows_pallas(dstf, subf, jnp.asarray([3, 0]), interpret=True)
    )
    want = np.asarray(dstf).copy()
    want[[3, 0]] = np.asarray(subf)
    np.testing.assert_array_equal(got, want)

    # support gate: odd geometries fall back to the XLA scatter
    assert scatter_rows_supported((8, 32, 128, 3), jnp.uint8)
    assert scatter_rows_supported((8, 512, 512), jnp.uint8)
    assert not scatter_rows_supported((8, 33, 128, 3), jnp.uint8)
    assert not scatter_rows_supported((8, 32, 100), jnp.uint8)
    assert not scatter_rows_supported((8, 128), jnp.uint8)
