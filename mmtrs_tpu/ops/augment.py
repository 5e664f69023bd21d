"""Batched, key-driven augmentation suite.

TPU-first replacement for the albumentations pipelines of
src/preprocessing/augment_records.py:
- ``legacy`` preset  (:94-130 _legacy_compose): HFlip .5, VFlip .05,
  ShiftScaleRotate (.05/.10/12°) p.9, Perspective .02-.05 p.2,
  OneOf{CLAHE(2.0), BrightnessContrast ±.15, HSV 5/12/8} p.5,
  GaussNoise var 5-15 p.2, MotionBlur(3-5) p.1, Elastic α10 σ5 p.1,
  CoarseDropout 1 hole size/24 p.1;
- ``ten`` preset     (:216-332 fixed_ten_variants): one fixed transform per
  aug_idx — hflip, vflip, translate 3-7%, scale ±10%, rotate ±25°,
  brightness/contrast, HSV, noise, motion blur, elastic;
- ``simple`` preset  (:170-213): gentler PIL-approximation set;
- ``none``.

Design: ALL geometric members of a pipeline are composed into ONE per-sample
3×3 homography and applied as a single bilinear-gather warp; photometric
members are fused elementwise ops whose parameters collapse to no-ops when
their probability gate fails — so batch shapes stay static and the whole
preset is one jit-compiled function ``f(batch, keys, aug_idx) -> batch``.
Randomness is derived per (seed, origin_id, aug_idx) via
mmtrs_tpu.utils.rng.key_for_origin, mirroring the reference's deterministic
per-image streams (augment_records.py:476). Parity with albumentations is
distributional, not bit-level (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmtrs_tpu.ops.clahe import clahe_rgb
from mmtrs_tpu.ops.color import hsv_to_rgb, rgb_to_hsv
import numpy as np

from mmtrs_tpu.ops.warp import (
    affineize_homography,
    hflip3,
    identity3,
    mat3,
    rotate3,
    scale3,
    shift_axis_windowed,
    translate3,
    vflip3,
    warp_affine_shear,
)

# ---------------------------------------------------------------------------
# Photometric primitives (batched, no-op-parameterizable)
# ---------------------------------------------------------------------------


def brightness_contrast(imgs, brightness, contrast):
    """albumentations RandomBrightnessContrast semantics (brightness_by_max):
    out = img·(1+c) + b·255. brightness/contrast: [B] per-sample."""
    b = brightness[:, None, None, None]
    c = contrast[:, None, None, None]
    return jnp.clip(imgs * (1.0 + c) + b * 255.0, 0.0, 255.0)


def hsv_shift(imgs, dh, ds, dv):
    """HueSaturationValue: shifts in OpenCV HSV units (H∈[0,180))."""
    hsv = rgb_to_hsv(imgs)
    h = (hsv[..., 0] + dh[:, None, None]) % 180.0
    s = jnp.clip(hsv[..., 1] + ds[:, None, None], 0.0, 255.0)
    v = jnp.clip(hsv[..., 2] + dv[:, None, None], 0.0, 255.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def gauss_noise(imgs, keys, var):
    """Additive white gaussian noise, per-channel, var: [B]."""
    def one(img, key, v):
        return img + jax.random.normal(key, img.shape) * jnp.sqrt(v)

    return jnp.clip(jax.vmap(one)(imgs, keys, var), 0.0, 255.0)


def _separable_blur(imgs, k1d):
    """Depthwise separable blur with a 1-D kernel (same padding)."""
    k = k1d / jnp.sum(k1d)
    r = (k.shape[0] - 1) // 2
    x = jnp.pad(imgs, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    out = sum(
        x[:, i : i + imgs.shape[1]] * k[i] for i in range(k.shape[0])
    )
    x = jnp.pad(out, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    out = sum(
        x[:, :, i : i + imgs.shape[2]] * k[i] for i in range(k.shape[0])
    )
    return out


def gaussian_blur3(imgs):
    """3×3 Gaussian (cv2 default σ for k=3)."""
    return _separable_blur(imgs, jnp.array([0.25, 0.5, 0.25], jnp.float32))


def motion_blur(imgs, keys, ksize: int = 5):
    """Directional line blur: per-sample random angle, k-tap line kernel
    splatted bilinearly onto a k×k grid (MotionBlur(3-5) analog)."""
    k = ksize
    r = (k - 1) / 2.0

    def kern(key):
        theta = jax.random.uniform(key, (), minval=0.0, maxval=jnp.pi)
        t = jnp.linspace(-r, r, k)
        px = t * jnp.cos(theta) + r
        py = t * jnp.sin(theta) + r
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        fx = px - x0
        fy = py - y0
        kernel = jnp.zeros((k + 1, k + 1))
        kernel = kernel.at[y0, x0].add((1 - fy) * (1 - fx))
        kernel = kernel.at[y0, x0 + 1].add((1 - fy) * fx)
        kernel = kernel.at[y0 + 1, x0].add(fy * (1 - fx))
        kernel = kernel.at[y0 + 1, x0 + 1].add(fy * fx)
        kernel = kernel[:k, :k]
        return kernel / jnp.sum(kernel)

    kernels = jax.vmap(kern)(keys)  # [B, k, k]

    # one grouped cross-correlation (lax convs don't flip kernels) instead of
    # k² full-tensor shift-multiply passes: rides the MXU, one HBM round-trip
    B, H, W, C = imgs.shape
    x = jnp.pad(
        imgs,
        ((0, 0), ((k - 1) // 2, k // 2), ((k - 1) // 2, k // 2), (0, 0)),
        mode="edge",
    )
    lhs = x.transpose(0, 3, 1, 2).reshape(1, B * C, H + k - 1, W + k - 1)
    rhs = jnp.repeat(kernels[:, None], C, axis=1).reshape(B * C, 1, k, k)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        (1, 1),
        "VALID",
        feature_group_count=B * C,
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def _gauss_kernel1d(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    return k / jnp.sum(k)


def elastic(imgs, keys, alpha: float = 10.0, sigma: float = 5.0):
    """ElasticTransform(α, σ): uniform(-1,1) displacement fields smoothed by
    a Gaussian then scaled by α; constant-border warp.

    Gather-free: the per-pixel displacement is bounded by α, so each axis
    is resampled with :func:`shift_axis_windowed` (2α+2 static slices —
    pure bandwidth). The two passes are a separable approximation of joint
    bilinear sampling — sub-pixel deviation where BOTH fields vary within
    a pixel, invisible at α=10/σ=5 (SURVEY §7 hard-part 3: distributional
    parity)."""
    B, H, W, C = imgs.shape
    radius = int(3 * sigma)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    kk = np.exp(-(xs**2) / (2 * sigma**2))
    kk = (kk / kk.sum()).astype(np.float32)  # host-side: sigma/radius static

    def band(n):
        """[n, n] banded Gaussian smoothing matrix with edge-clamp padding
        folded in (out = M @ f ≡ the padded k-tap correlation). Dense matmul
        is the MXU-native form — 1-channel convs lower poorly on TPU."""
        i = np.arange(n)
        m = np.zeros((n, n), np.float32)
        for d in range(-radius, radius + 1):
            j = np.clip(i + d, 0, n - 1)
            m[i, j] += kk[d + radius]
        return jnp.asarray(m)

    my, mx = band(H), band(W)

    def smooth(f):
        """Separable Gaussian over [B,H,W]: My @ f @ Mxᵀ (two matmuls)."""
        return jnp.einsum("hi,biw->bhw", my, f) @ mx.T

    def raw_fields(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.uniform(k1, (H, W), minval=-1.0, maxval=1.0),
            jax.random.uniform(k2, (H, W), minval=-1.0, maxval=1.0),
        )

    rdx, rdy = jax.vmap(raw_fields)(keys)
    dx = smooth(rdx) * alpha  # [B,H,W]
    dy = smooth(rdy) * alpha
    win = int(np.ceil(alpha)) + 1
    out = shift_axis_windowed(imgs, dy, win, axis=1)
    out = shift_axis_windowed(out, dx, win, axis=2)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + dy
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + dx
    inside = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    # dtype-preserving constant border (u8 chains stay u8 on TPU)
    fill = jnp.uint8(0) if out.dtype == jnp.uint8 else 0.0
    return jnp.where(inside[..., None], out, fill)


def coarse_dropout(imgs, keys, hole: int):
    """CoarseDropout(max_holes=1, size=hole), zero fill."""
    B, H, W, C = imgs.shape

    def one(img, key):
        ky, kx = jax.random.split(key)
        y0 = jax.random.randint(ky, (), 0, H - hole)
        x0 = jax.random.randint(kx, (), 0, W - hole)
        yy = jnp.arange(H)[:, None]
        xx = jnp.arange(W)[None, :]
        mask = (yy >= y0) & (yy < y0 + hole) & (xx >= x0) & (xx < x0 + hole)
        return jnp.where(mask[..., None], 0.0, img)

    return jax.vmap(one)(imgs, keys)


# ---------------------------------------------------------------------------
# Geometric composition
# ---------------------------------------------------------------------------


def perspective3(key, H, W, scale_lo=0.02, scale_hi=0.05):
    """Random 4-corner-jitter homography (A.Perspective analog): each corner
    moves by N(0, s)·side with s ~ U(lo, hi); solved by DLT."""
    ks, kj = jax.random.split(key)
    s = jax.random.uniform(ks, (), minval=scale_lo, maxval=scale_hi)
    jitter = jax.random.normal(kj, (4, 2)) * s * jnp.array([W, H])
    src = jnp.array(
        [[0.0, 0.0], [W - 1.0, 0.0], [W - 1.0, H - 1.0], [0.0, H - 1.0]]
    )
    dst = src + jitter
    # DLT: solve 8×8 for h = [h11..h32]
    def rows(p, q):
        x, y = p
        u, v = q
        return jnp.array(
            [
                [x, y, 1, 0, 0, 0, -u * x, -u * y],
                [0, 0, 0, x, y, 1, -v * x, -v * y],
            ]
        )

    A = jnp.concatenate([rows(src[i], dst[i]) for i in range(4)], axis=0)
    b = dst.reshape(-1)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)


def ssr3(key, H, W, shift=0.05, scale=0.10, rot=12.0):
    """ShiftScaleRotate: one rotation+scale about centre plus translation."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = jax.random.uniform(k1, (), minval=-rot, maxval=rot)
    sc = 1.0 + jax.random.uniform(k2, (), minval=-scale, maxval=scale)
    tx = jax.random.uniform(k3, (), minval=-shift, maxval=shift) * W
    ty = jax.random.uniform(k4, (), minval=-shift, maxval=shift) * H
    c = ((W - 1) / 2.0, (H - 1) / 2.0)
    from mmtrs_tpu.ops.warp import _to_3x3, rotation_matrix

    m = _to_3x3(rotation_matrix(ang, c, sc))
    from mmtrs_tpu.ops.warp import mat3 as _m3
    return _m3(translate3(tx, ty), m)


def _gate(key, p):
    return jax.random.uniform(key) < p


def _subset_cap(B: int, p: float) -> int:
    """Static sub-batch capacity for a p-gated op: mean + 4σ of
    Binomial(B, p), so the full-batch fallback fires with probability
    ≲1e-4 per batch (it is a perf fallback only — both paths are
    bit-identical per image)."""
    mu = B * p
    return min(B, max(2, int(np.ceil(mu + 4.0 * np.sqrt(mu * (1.0 - p)) ))))


def subset_apply(op, imgs, on, cap: int, *extras):
    """Apply a per-image-independent batch op only where ``on[b]``, paying
    for ``cap`` images instead of B.

    SPMD masking (compute-everything + jnp.where) makes every image pay for
    every p-gated augmentation; at p=.1 that is 10× the expected cost. This
    compacts the selected images to the front (argsort of the mask — batch
    rows are contiguous HBM copies, not per-element gathers), runs ``op`` on
    a static [cap, ...] sub-batch, and scatters results back. If more than
    ``cap`` images fire (probability ≲1e-4 by construction), a lax.cond
    falls back to the full-batch apply — same semantics, just slower.

    ``imgs`` may be a PYTREE of batch-axis-0 arrays (e.g. the planar-chain
    (r, g, b) plane tuple); ``op`` then receives and returns the same
    structure. ``op(sub_imgs, *sub_extras)`` must be per-image independent
    (vmap-like); ``extras`` are gathered with the same indices. Untouched
    rows pass through bit-exact; selected rows match the full-batch apply
    up to fp contraction ULPs (XLA schedules [cap,...] and [B,...] programs
    differently) — fine for augmentation, whose albumentations parity is
    distributional (SURVEY §7 hard-part 3). A given call is still fully
    deterministic: gates derive from per-origin keys, so the same inputs
    always take the same path.
    """
    leaves = jax.tree.leaves(imgs)
    B = leaves[0].shape[0]
    count = jnp.sum(on.astype(jnp.int32))

    def bmask(m, x):
        return m.reshape((-1,) + (1,) * (x.ndim - 1))

    def subset_path(_):
        idx = jnp.argsort(~on, stable=True)[:cap]  # selected rows first
        sub = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), imgs)
        sub_out = op(sub, *[jnp.take(e, idx, axis=0) for e in extras])
        keep = on[idx]

        # Scatter-back stays the XLA `.at[idx].set` ON PURPOSE — measured
        # round 5 (scripts/exp_scatter_r5.py, on-chip b128@512²): the
        # in-place Pallas row scatter (ops/pallas/scatter_kernel.py,
        # input_output_aliases) is SLOWER here (gather+scatter 4.37 ms vs
        # XLA 2.28; full subset op 7.4 vs 5.8) — the alias does not survive
        # the surrounding graph, so the pallas_call pays a full-batch copy
        # into its output buffer PLUS per-row DMA scheduling. XLA's scatter
        # performs the same copy but fuses it better. The standalone-jit
        # "2.6 ms pure copy" hypothesis (exp_subset_r5.py V4) overstated
        # production cost: here the operand is an intermediate, not an
        # undonated program input.
        return jax.tree.map(
            lambda x, s, so: x.at[idx].set(jnp.where(bmask(keep, so), so, s)),
            imgs, sub, sub_out,
        )

    def full_path(_):
        out = op(imgs, *extras)
        return jax.tree.map(
            lambda x, o: jnp.where(bmask(on, o), o, x), imgs, out
        )

    if cap >= B:
        return full_path(None)

    # No count==0 shortcut: measured on-chip (scripts/exp_subset_r5.py,
    # round 5), a cond identity branch must COPY the full batch (~2×100 MB
    # at b128@512², ≈3 ms) because a cond result can't alias its operand —
    # while the subset path on non-firing rows costs only the cap-sized op
    # plus an in-place scatter that restores the rows bit-exactly
    # (keep=False → where(keep, sub_out, sub) = sub). Running the subset
    # path unconditionally is cheaper than "skipping".
    return jax.lax.cond(count <= cap, subset_path, full_path, None)


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------


def legacy_geo_mats(keys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Per-sample composite geometric matrix of the ``legacy`` preset
    ([B,3,3] forward cv2 maps for an [H,W] frame). Split out so the fused
    preprocess path (preprocess.crop_warp composition) can absorb this
    matrix into the crop resample — key derivation is identical to
    :func:`augment_legacy`."""

    def geo_matrix(key):
        kh, kv, ks, kp, kg = jax.random.split(key, 5)
        m = identity3()
        m = jnp.where(_gate(kh, 0.5), mat3(hflip3(float(W)), m), m)
        m = jnp.where(_gate(kv, 0.05), mat3(vflip3(float(H)), m), m)
        m = jnp.where(_gate(jax.random.fold_in(ks, 1), 0.9), mat3(ssr3(ks, H, W), m), m)
        # perspective affine-ized at the centre → the whole composite stays
        # affine and rides the gather-free two-pass warp (strength .02-.05:
        # documented distributional deviation, SURVEY §7 hard-part 3)
        persp = affineize_homography(
            perspective3(kp, H, W), (W - 1) / 2.0, (H - 1) / 2.0
        )
        m = jnp.where(_gate(jax.random.fold_in(kp, 1), 0.2), mat3(persp, m), m)
        return m

    geo_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    return jax.vmap(geo_matrix)(geo_keys)


def _dropout_xy(key, H: int, W: int, hole: int):
    """The CoarseDropout hole origin, with coarse_dropout's exact draws."""
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, H - hole)
    x0 = jax.random.randint(kx, (), 0, W - hole)
    return y0.astype(jnp.float32), x0.astype(jnp.float32)


def photometric_params_legacy(keys: jnp.ndarray, H: int, W: int, hole: int):
    """Per-image parameters of the ``legacy`` preset's pointwise stretch.

    Returns (params [B,10] f32 — column layout of
    ops.pallas.photometric_kernel —, noise_keys [B], use_clahe [B] bool).
    Draw structure is identical to the pre-fusion implementation, so the
    same (seed, origin_id, aug_idx) keys produce the same gates/magnitudes.
    """

    def phot_params(key):
        kg, kc, kb, kcon, kh1, kh2, kh3 = jax.random.split(key, 7)
        on = _gate(kg, 0.5)
        which = jax.random.randint(kc, (), 0, 3)
        b = jnp.where(on & (which == 1),
                      jax.random.uniform(kb, (), minval=-0.15, maxval=0.15), 0.0)
        c = jnp.where(on & (which == 1),
                      jax.random.uniform(kcon, (), minval=-0.15, maxval=0.15), 0.0)
        dh = jnp.where(on & (which == 2),
                       jax.random.uniform(kh1, (), minval=-5.0, maxval=5.0), 0.0)
        ds = jnp.where(on & (which == 2),
                       jax.random.uniform(kh2, (), minval=-12.0, maxval=12.0), 0.0)
        dv = jnp.where(on & (which == 2),
                       jax.random.uniform(kh3, (), minval=-8.0, maxval=8.0), 0.0)
        use_clahe = on & (which == 0)
        use_hsv = on & (which == 2)
        return b, c, dh, ds, dv, use_clahe, use_hsv

    pk = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    b, c, dh, ds, dv, use_clahe, use_hsv = jax.vmap(phot_params)(pk)

    nk = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    noise_on = jax.vmap(lambda k: _gate(jax.random.fold_in(k, 0), 0.2))(nk)
    var = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, 1), (), minval=5.0, maxval=15.0
        )
    )(nk)
    sigma = jnp.sqrt(var) * noise_on.astype(jnp.float32)

    dk = jax.vmap(lambda k: jax.random.fold_in(k, 5))(keys)
    dr_on = jax.vmap(lambda k: _gate(jax.random.fold_in(k, 0), 0.1))(dk)
    y0, x0 = jax.vmap(lambda k: _dropout_xy(k, H, W, hole))(dk)

    params = jnp.stack(
        [b, c, dh, ds, dv, use_hsv.astype(jnp.float32), sigma,
         dr_on.astype(jnp.float32), y0, x0],
        axis=1,
    )
    return params, nk, use_clahe


def _fused_photometrics_ok(H: int, W: int) -> bool:
    try:
        from mmtrs_tpu.ops.pallas.photometric_kernel import supports

        return jax.default_backend() == "tpu" and supports(H, W)
    except Exception:  # pragma: no cover
        return False


def _qf(v):
    """Round-half-up to whole intensity levels, staying f32. The uint8
    staging quantiser — must match ``_quant_u8`` in the Pallas photometric
    kernel bit for bit (the reference's albumentations chain returns uint8
    after every transform; quantising at the same boundaries keeps the
    fused-TPU and XLA paths exactly comparable)."""
    return jnp.floor(jnp.clip(v, 0.0, 255.0) + 0.5)


def _q8(v):
    return _qf(v).astype(jnp.uint8)


def photometrics_pointwise_ref(
    imgs: jnp.ndarray, params: jnp.ndarray, noise_keys: jnp.ndarray, hole: int
) -> jnp.ndarray:
    """XLA oracle of the fused pointwise kernel: bc → hsv → noise → dropout
    with identical per-op semantics and identical uint8 staging after each
    op (noise bits are threefry here vs the kernel's hardware PRNG —
    statistical parity only, like albumentations). Returns uint8."""
    B, H, W, _ = imgs.shape
    b, c, dh, ds, dv = (params[:, i] for i in range(5))
    use_hsv = params[:, 5] > 0
    sigma = params[:, 6]
    dr_on = params[:, 7] > 0
    y0, x0 = params[:, 8], params[:, 9]

    out = _qf(brightness_contrast(imgs.astype(jnp.float32), b, c))
    cap16 = _subset_cap(B, 0.5 / 3.0)
    out = subset_apply(
        lambda s, h, sa, v: _qf(hsv_shift(s, h, sa, v)), out, use_hsv, cap16,
        dh, ds, dv,
    )
    out = subset_apply(
        lambda s, k, v: _qf(gauss_noise(s, k, v)),
        out, sigma > 0, _subset_cap(B, 0.2), noise_keys, sigma**2,
    )
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    in_hole = (
        (yy >= y0[:, None, None]) & (yy < y0[:, None, None] + hole)
        & (xx >= x0[:, None, None]) & (xx < x0[:, None, None] + hole)
        & dr_on[:, None, None]
    )
    return jnp.where(in_hole[..., None], 0.0, out).astype(jnp.uint8)


def legacy_photometrics(
    out: jnp.ndarray, keys: jnp.ndarray, img_size: int = 512,
    use_fused: bool | None = None,
) -> jnp.ndarray:
    """Everything after the geometric warp of the ``legacy`` preset — the
    pointwise stretch (OneOf{bc,hsv}, noise, dropout) as ONE fused Pallas
    pass on TPU (XLA oracle elsewhere), then the spatial members (OneOf's
    CLAHE branch, motion blur, elastic) subset-compacted.

    Op-order note vs albumentations' _legacy_compose (augment_records.py:
    94-130): noise and dropout are applied before CLAHE/blur/elastic here
    (they are pointwise and ride the fused pass); order differs only for
    the ≤3% of images where both a pointwise and a spatial member fire —
    within the preset's distributional-parity contract (SURVEY §7
    hard-part 3).

    Returns **uint8** — every stage boundary is uint8-staged exactly like
    the reference's albumentations chain (each transform returns uint8),
    which also quarters the HBM traffic of the p-gated subset scatters."""
    B, H, W = out.shape[0], out.shape[1], out.shape[2]
    hole = max(1, img_size // 24)
    params, nk, use_clahe = photometric_params_legacy(keys, H, W, hole)
    # normalize the entry boundary to uint8 for BOTH paths (the reference's
    # albumentations chain is uint8 at every boundary); the fused kernel
    # reads 1-byte pixels directly
    if out.dtype != jnp.uint8:
        out = _q8(out)

    if use_fused is None:
        use_fused = _fused_photometrics_ok(H, W)
    if use_fused:
        from mmtrs_tpu.ops.pallas.photometric_kernel import photometrics_fused_pallas

        seeds = jax.vmap(
            lambda k: jax.random.bits(k, (), jnp.uint32).astype(jnp.int32)
        )(nk)
        out = photometrics_fused_pallas(out, params, seeds, hole)
    else:
        out = photometrics_pointwise_ref(out, params, nk, hole)

    cap16 = _subset_cap(B, 0.5 / 3.0)

    def _clahe_sub(s):
        # on TPU ride the fused planar LAB↔RGB kernels (ops/pallas/
        # lab_kernels.py — no f32 LAB materialization); XLA oracle elsewhere
        if use_fused:
            try:
                from mmtrs_tpu.ops.pallas.lab_kernels import (
                    clahe_lab_fused,
                    supports as _lab_ok,
                )

                if _lab_ok(s.shape[1], s.shape[2]):
                    return clahe_lab_fused(s, clip=2.0, tiles=(8, 8))
            except Exception:  # pragma: no cover
                pass
        return _q8(clahe_rgb(s.astype(jnp.float32), clip=2.0, tiles=(8, 8),
                             quant_l=True))

    out = subset_apply(_clahe_sub, out, use_clahe, cap16)

    # motion blur p=.1
    bk = jax.vmap(lambda k: jax.random.fold_in(k, 3))(keys)
    blur_on = jax.vmap(lambda k: _gate(jax.random.fold_in(k, 0), 0.1))(bk)
    out = subset_apply(
        lambda s, k: _q8(motion_blur(s.astype(jnp.float32), k, ksize=5)),
        out, blur_on, _subset_cap(B, 0.1), bk,
    )

    # elastic p=.1 — u8 stays u8 through the windowed Pallas passes
    ek = jax.vmap(lambda k: jax.random.fold_in(k, 4))(keys)
    el_on = jax.vmap(lambda k: _gate(jax.random.fold_in(k, 0), 0.1))(ek)
    out = subset_apply(
        lambda s, k: _q8(elastic(s, k, alpha=10.0, sigma=5.0)),
        out, el_on, _subset_cap(B, 0.1), ek,
    )
    return out


@partial(jax.jit, static_argnames=("img_size",))
def augment_legacy(imgs: jnp.ndarray, keys: jnp.ndarray, img_size: int = 512):
    """The ``legacy`` albumentations pipeline as one fused batch op."""
    B, H, W, C = imgs.shape
    mats = legacy_geo_mats(keys, H, W)
    out = warp_affine_shear(imgs, mats, border="constant", cval=0.0)
    return legacy_photometrics(out, keys, img_size)


@jax.jit
def augment_ten(imgs: jnp.ndarray, keys: jnp.ndarray, aug_idx: jnp.ndarray):
    """The ``ten`` preset: variant k = aug_idx % 10 per sample
    (fixed_ten_variants, augment_records.py:216-332)."""
    B, H, W, C = imgs.shape
    which = jnp.asarray(aug_idx) % 10

    # geometric variants 0-4 as matrices (identity for 5-9)
    def geo(key, w):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        tx = (
            jax.random.uniform(k1, (), minval=0.03, maxval=0.07)
            * jnp.where(jax.random.bernoulli(k2), 1.0, -1.0) * W
        )
        ty = (
            jax.random.uniform(k3, (), minval=0.03, maxval=0.07)
            * jnp.where(jax.random.bernoulli(jax.random.fold_in(k2, 1)), 1.0, -1.0) * H
        )
        sc = jax.random.uniform(k4, (), minval=0.9, maxval=1.1)
        ang = jax.random.uniform(k5, (), minval=-25.0, maxval=25.0)
        c = ((W - 1) / 2.0, (H - 1) / 2.0)
        mats = jnp.stack(
            [
                hflip3(float(W)),
                vflip3(float(H)),
                translate3(tx, ty),
                scale3(sc, sc, c),
                rotate3(ang, c),
            ]
        )
        return jnp.where(w < 5, mats[jnp.minimum(w, 4)], identity3())

    mats = jax.vmap(geo)(keys, which)
    out = warp_affine_shear(imgs, mats, border="constant", cval=0.0)

    # photometric variants 5-9
    def phot_params(key, w):
        kb, kc, kh1, kh2, kh3, kv = jax.random.split(key, 6)
        b = jnp.where(w == 5, jax.random.uniform(kb, (), minval=-0.15, maxval=0.15), 0.0)
        c = jnp.where(w == 5, jax.random.uniform(kc, (), minval=-0.15, maxval=0.15), 0.0)
        dh = jnp.where(w == 6, jax.random.uniform(kh1, (), minval=-5.0, maxval=5.0), 0.0)
        ds = jnp.where(w == 6, jax.random.uniform(kh2, (), minval=-12.0, maxval=12.0), 0.0)
        dv = jnp.where(w == 6, jax.random.uniform(kh3, (), minval=-8.0, maxval=8.0), 0.0)
        var = jnp.where(w == 7, jax.random.uniform(kv, (), minval=5.0, maxval=15.0), 0.0)
        return b, c, dh, ds, dv, var

    b, c, dh, ds, dv, var = jax.vmap(phot_params)(keys, which)
    out = brightness_contrast(out, b, c)
    # each variant hits ~B/10 images; cap at B·0.2+4σ to absorb skewed
    # batches (variant-sorted callers overflow to the exact full apply)
    cap = _subset_cap(B, 0.2)
    out = subset_apply(
        lambda s, h, sa, v: hsv_shift(s, h, sa, v), out, which == 6, cap, dh, ds, dv
    )
    nk = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
    out = subset_apply(
        lambda s, k, v: gauss_noise(s, k, v), out, which == 7, cap, nk, var
    )
    bk = jax.vmap(lambda k: jax.random.fold_in(k, 8))(keys)
    out = subset_apply(lambda s, k: motion_blur(s, k, 5), out, which == 8, cap, bk)
    ek = jax.vmap(lambda k: jax.random.fold_in(k, 9))(keys)
    out = subset_apply(
        lambda s, k: elastic(s, k, alpha=10.0, sigma=5.0), out, which == 9, cap, ek
    )
    return jnp.clip(out, 0.0, 255.0)


@jax.jit
def augment_simple(imgs: jnp.ndarray, keys: jnp.ndarray, aug_idx: jnp.ndarray):
    """PIL-approximation fallback set (augment_records.py:170-213), selected
    by aug_idx % 10: 0 hflip, 1 vflip, 2 translate 3-7%, 3 scale ±10%,
    4 rotate ±25°, 5 brightness/contrast, 6 color, 7 noise σ8, 8 gaussian
    blur, 9 crop(pad 2-6)+resize ≈ centre zoom."""
    B, H, W, C = imgs.shape
    which = jnp.asarray(aug_idx) % 10

    def geo(key, w):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        tx = jax.random.uniform(k1, (), minval=-0.07, maxval=0.07) * W
        ty = jax.random.uniform(k2, (), minval=-0.07, maxval=0.07) * H
        sc = jax.random.uniform(k3, (), minval=0.9, maxval=1.1)
        ang = jax.random.uniform(k4, (), minval=-25.0, maxval=25.0)
        pad = jax.random.randint(k5, (), 2, 7).astype(jnp.float32)
        zoom = W / (W - 2.0 * pad)
        c = ((W - 1) / 2.0, (H - 1) / 2.0)
        mats = jnp.stack(
            [
                hflip3(float(W)),
                vflip3(float(H)),
                translate3(tx, ty),
                scale3(sc, sc, c),
                rotate3(ang, c),
                identity3(),  # 5 brightness/contrast
                identity3(),  # 6 color
                identity3(),  # 7 noise
                identity3(),  # 8 blur
                scale3(zoom, zoom, c),  # 9 crop+resize
            ]
        )
        return mats[w]

    mats = jax.vmap(geo)(keys, which)
    out = warp_affine_shear(imgs, mats, border="constant", cval=0.0)

    def phot_params(key, w):
        kb, kc, kcol = jax.random.split(key, 3)
        b = jnp.where(w == 5, jax.random.uniform(kb, (), minval=-0.1, maxval=0.1), 0.0)
        c = jnp.where(w == 5, jax.random.uniform(kc, (), minval=-0.1, maxval=0.1), 0.0)
        ds = jnp.where(w == 6, jax.random.uniform(kcol, (), minval=-25.0, maxval=25.0), 0.0)
        var = jnp.where(w == 7, 64.0, 0.0)  # σ=8 noise
        return b, c, ds, var

    b, c, ds, var = jax.vmap(phot_params)(keys, which)
    out = brightness_contrast(out, b, c)
    cap = _subset_cap(B, 0.2)
    out = subset_apply(
        lambda s, sa: hsv_shift(s, jnp.zeros_like(sa), sa, jnp.zeros_like(sa)),
        out, which == 6, cap, ds,
    )
    nk = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
    out = subset_apply(
        lambda s, k, v: gauss_noise(s, k, v), out, which == 7, cap, nk, var
    )
    out = subset_apply(lambda s: gaussian_blur3(s), out, which == 8, cap)
    return jnp.clip(out, 0.0, 255.0)


# ---------------------------------------------------------------------------
# RandAugment-equivalent train-time preset (the MM trainer's regularizer)
# ---------------------------------------------------------------------------
#
# The reference's strongest stream trains under timm
# create_transform(input_size=380, is_training=True,
# auto_augment="rand-m9-mstd0.5-inc1", re_prob=0.2)
# (train_mm_joint_dualtask.py:72-93): RandomResizedCrop + HFlip(.5) +
# RandAugment(2 ops, each gated Bernoulli(.5) per timm AugmentOp(prob=0.5),
# magnitude N(9,.5) of 10, increasing severity) + RandomErasing(p=.2,
# mode='pixel'). This is the on-device equivalent: RRC+flip+geometric ops
# compose into ONE affine warp; photometric ops apply with
# no-op parameters when not drawn (static shapes, one jit). Deviations
# (documented, distributional parity only): Equalize is omitted from the
# pool (per-image-per-channel histogram for one of 14 slots isn't worth the
# kernel), ops apply in a fixed order instead of draw order, and RRC clamps
# its box once instead of torchvision's 10-try loop.


def _rrc_hflip3(key, H, W, scale_lo=0.08, scale_hi=1.0):
    """RandomResizedCrop(+resize back to [H,W]) + HFlip(.5) as one forward
    affine (torchvision semantics, single clamped attempt)."""
    ka, kr, ki, kj, kf = jax.random.split(key, 5)
    area = jax.random.uniform(ka, (), minval=scale_lo, maxval=scale_hi) * H * W
    logr = jax.random.uniform(
        kr, (), minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    r = jnp.exp(logr)
    w = jnp.clip(jnp.sqrt(area * r), 8.0, float(W))
    h = jnp.clip(jnp.sqrt(area / r), 8.0, float(H))
    i = jax.random.uniform(ki, (), minval=0.0, maxval=1.0) * (H - h)
    j = jax.random.uniform(kj, (), minval=0.0, maxval=1.0) * (W - w)
    # dst→src is axis-aligned: src = s·dst + t (half-pixel centers)
    sx, sy = w / W, h / H
    tx = 0.5 * sx - 0.5 + j
    ty = 0.5 * sy - 0.5 + i
    m = jnp.array(
        [[1.0 / sx, 0.0, -tx / sx], [0.0, 1.0 / sy, -ty / sy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )  # forward (src→dst)
    return jnp.where(_gate(kf, 0.5), mat3(hflip3(float(W)), m), m)


# op order: 0-4 geometric (compose into the warp), 5-13 photometric
_RANDAUG_N_OPS = 14


def _randaug_params(key, H, W, magnitude, mag_std, n_ops):
    """Per-image draw: returns (geo matrix [3,3], photometric param dict).
    inc1 severity maps follow timm's increasing-transform scales."""
    c = ((W - 1) / 2.0, (H - 1) / 2.0)
    m_geo = identity3()
    phot = {
        "invert": jnp.zeros((), bool), "autoc": jnp.zeros((), bool),
        "post_step": jnp.ones(()), "solar_thr": jnp.full((), 256.0),
        "solar_add": jnp.zeros(()), "color_f": jnp.ones(()),
        "contrast_f": jnp.ones(()), "bright_f": jnp.ones(()),
        "sharp_f": jnp.ones(()),
    }
    for draw in range(n_ops):
        kd = jax.random.fold_in(key, draw)
        kop, kmag, ksign, kapp = jax.random.split(kd, 4)
        op = jax.random.randint(kop, (), 0, _RANDAUG_N_OPS)
        # timm wraps every op in AugmentOp(prob=0.5): each drawn op only
        # applies half the time. Sentinel the op index out of range when the
        # gate fails so every op==k / op<5 test below is false.
        op = jnp.where(
            jax.random.bernoulli(kapp, 0.5), op, jnp.int32(_RANDAUG_N_OPS)
        )
        m = jnp.clip(
            magnitude + jax.random.normal(kmag) * mag_std, 0.0, 10.0
        ) / 10.0
        sign = jnp.where(jax.random.bernoulli(ksign), 1.0, -1.0)
        # geometric: rotate ±30°, shear ±0.3, translate ±0.45·size
        ang = sign * 30.0 * m
        shear = sign * 0.3 * m
        t_amt = sign * 0.45 * m
        cx, cy = c
        sh_x = mat3(
            mat3(
                translate3(cx, cy),
                jnp.array([[1.0, shear, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),
            ),
            translate3(-cx, -cy),
        )
        sh_y = mat3(
            mat3(
                translate3(cx, cy),
                jnp.array([[1.0, 0.0, 0.0], [shear, 1.0, 0.0], [0.0, 0.0, 1.0]]),
            ),
            translate3(-cx, -cy),
        )
        geo_mats = jnp.stack(
            [
                rotate3(ang, c),
                sh_x,
                sh_y,
                translate3(t_amt * W, 0.0),
                translate3(0.0, t_amt * H),
            ]
        )
        m_geo = jnp.where(op < 5, mat3(geo_mats[jnp.minimum(op, 4)], m_geo), m_geo)
        enh = 1.0 + sign * 0.9 * m  # PIL enhance factor, inc1
        phot = {
            "invert": phot["invert"] | (op == 5),
            "autoc": phot["autoc"] | (op == 6),
            # timm PosterizeIncreasing keeps 4-int(4m) bits: step
            # 2^(4+int(4m)), clamped to 128 (keep >=1 bit)
            "post_step": jnp.where(
                op == 7,
                jnp.minimum(
                    phot["post_step"] * 2.0 ** (4.0 + jnp.floor(4.0 * m)), 128.0
                ),
                phot["post_step"],
            ),
            "solar_thr": jnp.where(
                op == 8, jnp.minimum(phot["solar_thr"], 255.0 * (1.0 - m)),
                phot["solar_thr"],
            ),
            "solar_add": jnp.where(
                op == 9, phot["solar_add"] + 110.0 * m, phot["solar_add"]
            ),
            "color_f": jnp.where(op == 10, phot["color_f"] * enh, phot["color_f"]),
            "contrast_f": jnp.where(
                op == 11, phot["contrast_f"] * enh, phot["contrast_f"]
            ),
            "bright_f": jnp.where(
                op == 12, phot["bright_f"] * enh, phot["bright_f"]
            ),
            "sharp_f": jnp.where(op == 13, phot["sharp_f"] * enh, phot["sharp_f"]),
        }
    return m_geo, phot


def randaug_geo_mats(
    keys: jnp.ndarray, H: int, W: int,
    magnitude: float = 9.0, mag_std: float = 0.5, n_ops: int = 2,
):
    """[B,3,3] composite forward maps (RRC+flip+geo ops) + photometric
    params — split out so a fused caller can absorb the matrix elsewhere."""
    def one(key):
        k_rrc, k_ops = jax.random.split(key)
        m_rrc = _rrc_hflip3(k_rrc, H, W)
        m_ops, phot = _randaug_params(k_ops, H, W, magnitude, mag_std, n_ops)
        return mat3(m_ops, m_rrc), phot

    return jax.vmap(one)(keys)


def randaug_photometrics(out: jnp.ndarray, phot: dict) -> jnp.ndarray:
    """Apply the drawn photometric ops (no-op parameters when undrawn),
    fixed order: invert → autocontrast → posterize → solarize(+add) →
    color → contrast → brightness → sharpness."""
    B = out.shape[0]
    bmask = lambda v: v[:, None, None, None]
    out = jnp.where(bmask(phot["invert"]), 255.0 - out, out)

    lo = jnp.min(out, axis=(1, 2), keepdims=True)
    hi = jnp.max(out, axis=(1, 2), keepdims=True)
    stretched = (out - lo) * (255.0 / jnp.maximum(hi - lo, 1.0))
    out = jnp.where(bmask(phot["autoc"]), stretched, out)

    step = phot["post_step"][:, None, None, None]
    out = jnp.floor(out / step) * step

    thr = phot["solar_thr"][:, None, None, None]
    out = jnp.where(out >= thr, 255.0 - out, out)
    add = phot["solar_add"][:, None, None, None]
    out = jnp.clip(jnp.where(out < 128.0, out + add, out), 0.0, 255.0)

    gray = (0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2])[
        ..., None
    ]
    cf = phot["color_f"][:, None, None, None]
    out = jnp.clip(gray + (out - gray) * cf, 0.0, 255.0)

    mean = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
    kf = phot["contrast_f"][:, None, None, None]
    out = jnp.clip(mean + (out - mean) * kf, 0.0, 255.0)

    bf = phot["bright_f"][:, None, None, None]
    out = jnp.clip(out * bf, 0.0, 255.0)

    blur = gaussian_blur3(out)
    sf = phot["sharp_f"][:, None, None, None]
    out = jnp.clip(blur + (out - blur) * sf, 0.0, 255.0)
    return out


def random_erasing(
    imgs: jnp.ndarray, keys: jnp.ndarray, p: float = 0.2,
    scale=(0.02, 1.0 / 3.0), ratio=(0.3, 3.3),
) -> jnp.ndarray:
    """timm RandomErasing(mode='pixel'), the reference MM config
    (train_mm_joint_dualtask.py:80): fill a random rectangle with per-pixel
    normal noise, prob p. timm applies it post-normalization with N(0,1)
    fill; this runs pre-normalization on [0,255], so the equivalent fill is
    mean*255 + N(0,1)*std*255 per channel (ImageNet stats), clipped."""
    B, H, W, C = imgs.shape

    def box(key):
        kg, ka, kr, ki, kj = jax.random.split(key, 5)
        on = _gate(kg, p)
        area = jax.random.uniform(ka, (), minval=scale[0], maxval=scale[1]) * H * W
        logr = jax.random.uniform(
            kr, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
        )
        r = jnp.exp(logr)
        w = jnp.clip(jnp.sqrt(area * r), 1.0, float(W))
        h = jnp.clip(jnp.sqrt(area / r), 1.0, float(H))
        i = jax.random.uniform(ki, (), minval=0.0, maxval=1.0) * (H - h)
        j = jax.random.uniform(kj, (), minval=0.0, maxval=1.0) * (W - w)
        return on, i, j, h, w

    on, i, j, h, w = jax.vmap(box)(keys)
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    inside = (
        (yy >= i[:, None, None]) & (yy < (i + h)[:, None, None])
        & (xx >= j[:, None, None]) & (xx < (j + w)[:, None, None])
    )
    kill = inside & on[:, None, None]
    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32) * 255.0
    noise = jax.vmap(
        lambda k: jax.random.normal(jax.random.fold_in(k, 7), (H, W, C))
    )(keys)
    noise = jnp.clip(mean + noise * std, 0.0, 255.0)
    return jnp.where(kill[..., None], noise, imgs)


@partial(jax.jit, static_argnames=("img_size",))
def augment_randaug(imgs: jnp.ndarray, keys: jnp.ndarray, img_size: int = 512):
    """RRC+flip+RandAugment(2, m9±0.5, inc1)+RandomErasing(.2) as one
    fused batch op (see module comment above for the timm contract and the
    documented deviations)."""
    B, H, W, C = imgs.shape
    mats, phot = randaug_geo_mats(keys, H, W)
    # timm RandAugment fills geometric ops with gray (128); RRC itself never
    # leaves the frame, so the fill only shows where rotate/shear/translate do
    out = warp_affine_shear(imgs, mats, border="constant", cval=128.0)
    out = randaug_photometrics(out, phot)
    er_keys = jax.vmap(lambda k: jax.random.fold_in(k, 99))(keys)
    return random_erasing(out, er_keys, p=0.2)


def augment_batch(imgs, keys, preset: str, aug_idx=None, img_size: int = 512):
    """Dispatch by preset name (get_augmenter parity, augment_records.py:335-362)."""
    if preset == "none":
        return imgs
    if preset == "legacy":
        return augment_legacy(imgs, keys, img_size=img_size)
    if preset == "randaug":
        return augment_randaug(imgs, keys, img_size=img_size)
    if preset == "ten":
        assert aug_idx is not None
        return augment_ten(imgs, keys, jnp.asarray(aug_idx))
    if preset == "simple":
        assert aug_idx is not None
        return augment_simple(imgs, keys, jnp.asarray(aug_idx))
    raise ValueError(f"unknown preset: {preset}")
