"""Batched geometric warps via inverse-mapped bilinear gather.

The TPU-first replacement for cv2.warpAffine / cv2.warpPerspective
(normalise.py:51-56, augment presets): every geometric augmentation —
flip, shift/scale/rotate, perspective — is composed into ONE per-sample
3×3 homography on the host side of the jit boundary, so the whole geometric
chain costs a single gather pass per image regardless of how many transforms
are stacked.

Conventions:
- images are [B, H, W, C] float32;
- matrices are *forward* maps (src→dst) like cv2; sampling uses the inverse;
- border modes: 'replicate' (clamp, cv2.BORDER_REPLICATE) and
  'constant' (cval fill, cv2.BORDER_CONSTANT).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rotation_matrix(angle_deg, center_xy, scale=1.0) -> jnp.ndarray:
    """cv2.getRotationMatrix2D parity: 2×3 forward map, positive angle =
    counter-clockwise in display coordinates (y down)."""
    a = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    alpha = jnp.cos(a) * scale
    beta = jnp.sin(a) * scale
    cx, cy = center_xy
    return jnp.array(
        [
            [alpha, beta, (1 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1 - alpha) * cy],
        ],
        dtype=jnp.float32,
    )


def mat3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3×3 transform composition at FULL f32 precision.

    `a @ b` at default precision runs bf16 on the TPU MXU — transform
    entries like 511 (hflip) aren't even bf16-representable and scales
    round at 2^-8, which shifted sampling grids by up to ~0.3 px (round-3:
    6-intensity-level errors on noise images traced here). HIGHEST forces
    the f32 path; a 3×3 product is scalar work anyway."""
    return jnp.einsum(
        "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
    )


def _to_3x3(m: jnp.ndarray) -> jnp.ndarray:
    if m.shape[-2:] == (3, 3):
        return m
    pad = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=m.dtype), m.shape[:-2] + (1, 3)
    )
    return jnp.concatenate([m, pad], axis=-2)


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a 2×3 (or 3×3) transform, returned as 3×3.

    Closed-form adjugate/determinant — NOT jnp.linalg.inv: the batched LU
    path compiles a while-loop program (minutes through a remote-compile
    tunnel) and was observed returning low-precision inverses for mixed
    batches on TPU (round-3: 6-intensity-level warp errors traced here).
    The adjugate is exact to f32 rounding for these well-conditioned
    transform matrices and fuses into the surrounding program."""
    m3 = _to_3x3(m)
    a, b, c = m3[..., 0, 0], m3[..., 0, 1], m3[..., 0, 2]
    d, e, f = m3[..., 1, 0], m3[..., 1, 1], m3[..., 1, 2]
    g, h, i = m3[..., 2, 0], m3[..., 2, 1], m3[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1)
    row1 = jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1)
    row2 = jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def sample_bilinear(
    img: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    border: str = "replicate",
    cval: float = 0.0,
) -> jnp.ndarray:
    """Bilinear sample of img [H,W,C] at float coords ys/xs [...]."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        return img[yc, xc]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    if border == "constant":
        inside = (
            (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
        )[..., None]
        out = jnp.where(inside, out, cval)
    return out


def _warp_one(img, inv3, out_h, out_w, border, cval, perspective):
    yy = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    # unrolled 3×3 coordinate transform — a matmul would run bf16 on the MXU
    # and destroy sampling precision at 512px scales
    sx = inv3[0, 0] * xx + inv3[0, 1] * yy + inv3[0, 2]
    sy = inv3[1, 0] * xx + inv3[1, 1] * yy + inv3[1, 2]
    if perspective:
        sz = inv3[2, 0] * xx + inv3[2, 1] * yy + inv3[2, 2]
        sz = jnp.where(jnp.abs(sz) > 1e-8, sz, 1e-8)
        sx, sy = sx / sz, sy / sz
    return sample_bilinear(img, sy, sx, border, cval)


@partial(jax.jit, static_argnames=("out_hw", "border", "perspective"))
def warp_affine(
    imgs: jnp.ndarray,
    matrices: jnp.ndarray,
    out_hw: tuple[int, int] | None = None,
    border: str = "replicate",
    cval: float = 0.0,
    perspective: bool = False,
) -> jnp.ndarray:
    """Batched warp. ``matrices`` are per-sample forward maps [B,2,3] or
    [B,3,3] (src→dst, cv2 convention)."""
    B, H, W, _ = imgs.shape
    out_h, out_w = out_hw or (H, W)
    inv = jax.vmap(invert_affine)(matrices)
    return jax.vmap(
        lambda im, m: _warp_one(im, m, out_h, out_w, border, cval, perspective)
    )(imgs, inv)


def warp_perspective(imgs, matrices, out_hw=None, border="replicate", cval=0.0):
    return warp_affine(imgs, matrices, out_hw, border, cval, perspective=True)


# ---------------------------------------------------------------------------
# Gather-free rotation (Paeth 3-shear decomposition)
# ---------------------------------------------------------------------------
#
# TPU gathers run at ~45M taps/s (measured) — a full-image bilinear warp
# costs ~500 ms/batch32. Rotation decomposes exactly into three 1-D shears
# (Paeth '86): R(θ) = Sx(α)·Sy(β)·Sx(α), α = -tan(θ/2), β = sin θ. Each
# shear is a per-row fractional translation, implemented as a log-shift
# cascade of jnp.roll + select (pure HBM bandwidth, ~10 passes) — two
# orders of magnitude faster than the gather path. Interior pixels match
# the direct warp up to triple-resampling blur; borders replicate.


def _pallas_shift_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _shift_rows_frac(img: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """out[b, y, x] = in[b, y, x + off[b, y]] (bilinear, replicate border).

    img: [B, H, W, C]; off: [B, H] float offsets (inverse-map convention).
    On TPU this dispatches to the Pallas kernel (one HBM read+write; the
    XLA cascade below materializes the batch ~9×). Semantics identical.
    """
    if _pallas_shift_available():
        from mmtrs_tpu.ops.pallas.shift_kernel import shift_rows_pallas

        B, H, W, C = img.shape
        # u8 transport only on full-lane-tile widths; odd (serve-bucketed)
        # widths keep the f32 path that real-TPU runs have exercised —
        # conservative until odd-shape u8 blocks are validated on Mosaic
        if img.dtype == jnp.uint8 and W % 128 != 0:
            img = img.astype(jnp.float32)
        planar = img.transpose(0, 3, 1, 2).reshape(B * C * H, W)
        off_r = jnp.broadcast_to(off[:, None, :], (B, C, H)).reshape(-1)
        out = shift_rows_pallas(planar, off_r.astype(jnp.float32))
        return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    return _shift_rows_frac_xla(img, off)


def _shift_rows_frac_xla(img: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback (and CPU-test oracle) for :func:`_shift_rows_frac`."""
    B, H, W, C = img.shape
    k = jnp.floor(off)
    f = (off - k)[:, :, None, None]

    def int_shift(x, kk):
        """x rolled left by kk (per-row ints, wrap); kk in [0, W)."""
        s = jnp.mod(kk.astype(jnp.int32), W)
        bit = 1
        while bit < W:
            rolled = jnp.roll(x, -bit, axis=2)
            take = (s & bit).astype(bool)[:, :, None, None]
            x = jnp.where(take, rolled, x)
            bit *= 2
        return x

    a = int_shift(img, k)
    b = jnp.roll(a, -1, axis=2)  # shift by k+1 = shift by k then by 1
    out = (1.0 - f) * a + f * b

    # replicate border: positions whose source column leaves [0, W-1]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    src = xx + off[:, :, None]
    left = img[:, :, :1, :]
    right = img[:, :, -1:, :]
    out = jnp.where((src < 0.0)[..., None], left, out)
    out = jnp.where((src > W - 1.0)[..., None], right, out)
    return out


def shift_axis_windowed(
    imgs: jnp.ndarray, off: jnp.ndarray, max_shift: int, axis: int = 2
) -> jnp.ndarray:
    """PER-PIXEL fractional shift along one spatial axis:
    ``out[b,y,x] = in[b,y,x+off[b,y,x]]`` (axis=2) with |off| ≤ max_shift.

    Gather-free: the source window is static, so the result is a weighted
    sum of 2·max_shift+2 STATIC slices of an edge-padded copy — pure
    streaming bandwidth, no gathers. Exact bilinear for any offset field
    bounded by the window (elastic α=10 → window 11). Edge-replicate
    sourcing; combine with an explicit mask for constant borders.
    """
    if axis == 1:
        return jnp.swapaxes(
            shift_axis_windowed(jnp.swapaxes(imgs, 1, 2),
                                jnp.swapaxes(off, 1, 2), max_shift),
            1, 2,
        )
    B, H, W, C = imgs.shape
    if _pallas_shift_available():
        from mmtrs_tpu.ops.pallas.shift_kernel import shift_rows_windowed_pallas

        # u8 transport only on full-lane-tile widths (see _shift_rows_frac)
        if imgs.dtype == jnp.uint8 and W % 128 != 0:
            imgs = imgs.astype(jnp.float32)
        planar = imgs.transpose(0, 3, 1, 2).reshape(B * C * H, W)
        off_r = jnp.broadcast_to(off[:, None, :, :], (B, C, H, W)).reshape(-1, W)
        out = shift_rows_windowed_pallas(
            planar, off_r.astype(jnp.float32), int(max_shift)
        )
        return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    m = int(max_shift)
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    src = jnp.clip(xx + off, 0.0, W - 1.0)
    rel = (src - xx)[..., None]  # [B,H,W,1] ∈ [-m, m]
    pad = jnp.pad(imgs, ((0, 0), (0, 0), (m, m + 1), (0, 0)), mode="edge")
    out = jnp.zeros_like(imgs)
    for k in range(-m, m + 2):
        w = jnp.maximum(1.0 - jnp.abs(rel - k), 0.0)
        out = out + w * jax.lax.slice_in_dim(pad, m + k, m + k + W, axis=2)
    return out


def _resample_rows_affine(
    imgs: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    precision=jax.lax.Precision.HIGH,
) -> jnp.ndarray:
    """``out[b,y,x] = in[b, y, α[b]·x + β[b,y]]`` — one per-row butterfly
    shift + one per-image interpolation MATMUL. The per-axis building
    block of the gather-free affine warp: scale rides the MXU, translation
    rides the log-shift cascade. Replicate border.

    Decomposition: with r = mean_y β (per image), the butterfly handles
    only the per-row DEVIATION β−r and the matmul coordinate is α·x+r —
    so both stages stay in-range for flips (α<0) and large constant
    offsets, and interior samples compose to the exact source
    α·x + (β−r) + r."""
    B, H, W, C = imgs.shape
    r = jnp.mean(beta, axis=1)  # [B]
    tmp = _shift_rows_frac(imgs, beta - r[:, None])  # in[y, x + (β(y)−r)]
    xo = jnp.arange(W, dtype=jnp.float32)[None, :, None]  # out col
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]  # src col
    coord = jnp.clip(
        alpha[:, None, None] * xo + r[:, None, None], 0.0, W - 1.0
    )
    M = jnp.maximum(1.0 - jnp.abs(coord - xs), 0.0)  # [B, Wout, Wsrc]
    return jnp.einsum("bhwc,bxw->bhxc", tmp, M, precision=precision)


def invert_affine_params(mats: jnp.ndarray):
    """[B,2,3]/[B,3,3] forward cv2 maps → inverse-map coefficients
    (a,b,c,d,e,f): src_x = a·x + b·y + c, src_y = d·x + e·y + f."""
    inv = jax.vmap(invert_affine)(mats)
    return (inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2],
            inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2])


def _fused_resample_ok(H: int, W: int) -> bool:
    if not _pallas_shift_available():
        return False
    ok_dim = lambda n: any(n % r == 0 for r in range(min(128, n), 7, -8))
    return H % 8 == 0 and W % 8 == 0 and ok_dim(H) and ok_dim(W)


def _row_block(n: int) -> int:
    for r in range(min(128, n // 8 * 8), 7, -8):
        if n % r == 0:
            return r
    raise ValueError(n)


def _warp_shear_params(H, W, a, b, c, d, e_safe, f):
    """Shared two-pass shear parameters: per-row offsets for the horizontal
    pass and per-column offsets for the vertical pass."""
    ys_idx = jnp.arange(H, dtype=jnp.float32)[None, :]
    xs_idx = jnp.arange(W, dtype=jnp.float32)[None, :]
    alpha_h = a - b * d / e_safe                     # [B]
    beta_h = (b / e_safe)[:, None] * ys_idx + (c - b * f / e_safe)[:, None]
    r_h = jnp.mean(beta_h, axis=1)                   # [B]
    off_h = beta_h - r_h[:, None]                    # [B, H]
    beta_v = d[:, None] * xs_idx + f[:, None]        # [B, W]
    r_v = jnp.mean(beta_v, axis=1)
    off_v = beta_v - r_v[:, None]                    # [B, W]
    return alpha_h, r_h, off_h, r_v, off_v


def _warp_shear_fused_planes(planes, a, b, c, d, e_safe, f, interpret=False):
    """Planar-chain twin of :func:`_warp_shear_fused`: input and output are
    3-tuples of [B,H,W] planes, so the NHWC planarize/interleave passes of
    the interleaved entry point disappear entirely (round-5 lever: each was
    a full u8 batch read+write). Same kernels, same offsets, same u8
    staging rules — per-plane [B·H, W] rows instead of [B·C·H, W]."""
    from mmtrs_tpu.ops.pallas.shift_kernel import resample_rows_pallas

    B, H, W = planes[0].shape
    alpha_h, r_h, off_h, r_v, off_v = _warp_shear_params(H, W, a, b, c, d,
                                                         e_safe, f)
    u8_ok = (
        planes[0].dtype == jnp.uint8
        and _row_block(H) % 32 == 0
        and _row_block(W) % 32 == 0
    )
    mid_dt = jnp.uint8 if u8_ok else jnp.float32
    out_dt = jnp.uint8 if u8_ok else jnp.float32

    rep_h = lambda v: jnp.broadcast_to(v[:, None], (B, H)).reshape(-1)
    rep_w = lambda v: jnp.broadcast_to(v[:, None], (B, W)).reshape(-1)
    off_hr = off_h.reshape(-1)
    off_vr = off_v.reshape(-1)

    outs = []
    for p in planes:
        tmp = resample_rows_pallas(
            p.reshape(B * H, W), off_hr, rep_h(alpha_h), rep_h(r_h),
            block_rows=_row_block(H), out_dtype=mid_dt, interpret=interpret,
        )
        tmpT = tmp.reshape(B, H, W).transpose(0, 2, 1).reshape(B * W, H)
        outT = resample_rows_pallas(
            tmpT, off_vr, rep_w(e_safe), rep_w(r_v),
            block_rows=_row_block(W), out_dtype=out_dt, interpret=interpret,
        )
        outs.append(outT.reshape(B, W, H).transpose(0, 2, 1))
    return tuple(outs)


def _warp_shear_fused(imgs, a, b, c, d, e_safe, f):
    """Planar fused two-pass warp: ONE u8 (or f32) planarize, per-pass
    fused shift+interp-matmul Pallas kernels (shift_kernel.
    resample_rows_pallas). The inter-pass intermediate is stored/transposed
    as **uint8** (round-half-up) — ¼ the HBM traffic of the f32 form for
    ≤0.5 level of added interpolation error; cv2's INTER_LINEAR is 5-bit
    fixed point, coarser than this. Same Catmull-Smith decomposition as
    the XLA path below."""
    from mmtrs_tpu.ops.pallas.shift_kernel import resample_rows_pallas

    B, H, W, C = imgs.shape
    alpha_h, r_h, off_h, r_v, off_v_bw = _warp_shear_params(
        H, W, a, b, c, d, e_safe, f
    )

    # u8 staging only for uint8 INPUTS (f32 chains may carry arbitrary-range
    # data — e.g. normalized [0,1] images — that a u8 round-trip would
    # destroy; the warp is dtype-preserving, so quantization is only legal
    # when the caller already lives on the u8 lattice) and only where the
    # row blocks land on native 32-row u8 tiles (the production 512²
    # geometry); other shapes keep f32 intermediates — conservative until
    # odd-block u8 stores are validated on real Mosaic
    u8_ok = (
        imgs.dtype == jnp.uint8
        and _row_block(H) % 32 == 0
        and _row_block(W) % 32 == 0
    )
    mid_dt = jnp.uint8 if u8_ok else jnp.float32

    planar = imgs.transpose(0, 3, 1, 2).reshape(B * C * H, W)
    rep = lambda v: jnp.broadcast_to(
        v[:, None, None], (B, C, H)
    ).reshape(-1)
    off_r = jnp.broadcast_to(off_h[:, None, :], (B, C, H)).reshape(-1)
    tmp = resample_rows_pallas(
        planar, off_r, rep(alpha_h), rep(r_h), block_rows=_row_block(H),
        out_dtype=mid_dt,
    )  # [B·C·H, W]

    # vertical pass: columns become rows
    tmpT = tmp.reshape(B, C, H, W).transpose(0, 1, 3, 2).reshape(B * C * W, H)
    off_v = jnp.broadcast_to(
        off_v_bw[:, None, :], (B, C, W)
    ).reshape(-1)
    repv = lambda v: jnp.broadcast_to(
        v[:, None, None], (B, C, W)
    ).reshape(-1)
    # dtype-preserving output (cv2.warpAffine contract): uint8 chains get
    # a u8 store from the kernel — the SAME round-half-up quantiser the
    # chain applies at its next boundary anyway, minus a full f32
    # transpose+quantise round-trip
    out_dt = jnp.uint8 if u8_ok else jnp.float32
    outT = resample_rows_pallas(
        tmpT, off_v, repv(e_safe), repv(r_v), block_rows=_row_block(W),
        out_dtype=out_dt,
    )
    return outT.reshape(B, C, W, H).transpose(0, 3, 2, 1)  # NHWC


def warp_affine_shear(
    imgs: jnp.ndarray,
    matrices: jnp.ndarray,
    border: str = "constant",
    cval: float = 0.0,
) -> jnp.ndarray:
    """Gather-free batched affine warp (cv2 forward-matrix convention).

    Catmull-Smith two-pass separable decomposition of the inverse map
    src_x = a·x+b·y+c, src_y = d·x+e·y+f:
      pass 1 (horizontal): tmp[y',x] = in[y', (a−bd/e)·x + (b/e)·y' + c−bf/e]
      pass 2 (vertical):   out[y,x]  = tmp[e·y + d·x + f, x]
    Each pass = one butterfly row-shift + one MXU interp matmul
    (_resample_rows_affine). Requires |e| ≳ 0.3 (|rotation| ≲ 70° after
    flips) — always true for the augmentation presets; use warp_affine
    (gather) outside that envelope. ~100× faster than the gather warp on
    TPU (round-1 measurement: gathers ≈ 45M taps/s).
    """
    B, H, W, C = imgs.shape
    a, b, c, d, e, f = invert_affine_params(matrices)
    e_safe = jnp.where(jnp.abs(e) < 1e-3, jnp.where(e < 0, -1e-3, 1e-3), e)

    if _fused_resample_ok(H, W):
        out = _warp_shear_fused(imgs, a, b, c, d, e_safe, f)
    else:
        ys_idx = jnp.arange(H, dtype=jnp.float32)[None, :]
        xs_idx = jnp.arange(W, dtype=jnp.float32)[None, :]

        alpha_h = a - b * d / e_safe
        beta_h = (b / e_safe)[:, None] * ys_idx + (c - b * f / e_safe)[:, None]
        tmp = _resample_rows_affine(imgs, alpha_h, beta_h)

        # vertical: transpose trick — columns become rows
        beta_v = d[:, None] * xs_idx + f[:, None]
        tmpT = jnp.swapaxes(tmp, 1, 2)
        outT = _resample_rows_affine(tmpT, e, beta_v)
        out = jnp.swapaxes(outT, 1, 2)

    if border == "constant":
        yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        sx = a[:, None, None] * xx + b[:, None, None] * yy + c[:, None, None]
        sy = d[:, None, None] * xx + e[:, None, None] * yy + f[:, None, None]
        inside = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
        fill = (
            jnp.uint8(int(round(cval))) if out.dtype == jnp.uint8 else cval
        )
        out = jnp.where(inside[..., None], out, fill)
    return out


def affineize_homography(h3: jnp.ndarray, cx: float, cy: float) -> jnp.ndarray:
    """First-order (tangent) affine of a homography at the image centre:
    the gather-free stand-in for the gentle augmentation Perspective
    (strength .02-.05 — documented distributional deviation, SURVEY §7
    hard-part 3). Returns a 3×3 affine (last row 0,0,1)."""
    p = jnp.array([cx, cy, 1.0])
    w = jnp.einsum("ij,j->i", h3, p, precision=jax.lax.Precision.HIGHEST)
    u, v, s = w[0], w[1], w[2]
    # Jacobian of ((h00x+h01y+h02)/s', ...) at centre
    j00 = (h3[0, 0] * s - u * h3[2, 0]) / (s * s)
    j01 = (h3[0, 1] * s - u * h3[2, 1]) / (s * s)
    j10 = (h3[1, 0] * s - v * h3[2, 0]) / (s * s)
    j11 = (h3[1, 1] * s - v * h3[2, 1]) / (s * s)
    tx = u / s - (j00 * cx + j01 * cy)
    ty = v / s - (j10 * cx + j11 * cy)
    return jnp.array(
        [[j00, j01, tx], [j10, j11, ty], [0.0, 0.0, 1.0]], jnp.float32
    )


def rotate_shear3(
    imgs: jnp.ndarray, angles_deg: jnp.ndarray, center_xy=None
) -> jnp.ndarray:
    """Batched rotation about the centre via 3 shears; cv2-convention
    (positive angle = counter-clockwise in display coords), replicate
    border. angles: [B] degrees, |θ| ≤ 90."""
    B, H, W, C = imgs.shape
    cx, cy = center_xy if center_xy is not None else ((W - 1) / 2.0, (H - 1) / 2.0)
    # cv2's +θ CCW (y down) equals -θ in math coords; the Paeth params for
    # the INVERSE sampling of R_cv2(θ) come out as:
    th = jnp.deg2rad(jnp.asarray(angles_deg, jnp.float32))
    alpha = -jnp.tan(th / 2.0)  # x-shear factor
    beta = jnp.sin(th)  # y-shear factor

    ys = jnp.arange(H, dtype=jnp.float32)[None, :] - cy  # [1, H]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - cx  # [1, W]

    # pass 1: x-shear   out[y, x] = in[y, x + α·(y−cy)]
    out = _shift_rows_frac(imgs, alpha[:, None] * ys)
    # pass 2: y-shear   out[y, x] = in[y + β·(x−cx), x]  (transpose trick)
    out = jnp.swapaxes(out, 1, 2)
    out = _shift_rows_frac(out, beta[:, None] * xs)
    out = jnp.swapaxes(out, 1, 2)
    # pass 3: x-shear
    out = _shift_rows_frac(out, alpha[:, None] * ys)
    return out


# ---------------------------------------------------------------------------
# Transform composers (host/jit-agnostic 3×3 builders)
# ---------------------------------------------------------------------------


def identity3() -> jnp.ndarray:
    return jnp.eye(3, dtype=jnp.float32)


def translate3(tx, ty) -> jnp.ndarray:
    return jnp.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], dtype=jnp.float32)


def scale3(sx, sy, center_xy=(0.0, 0.0)) -> jnp.ndarray:
    cx, cy = center_xy
    return mat3(
        mat3(
            translate3(cx, cy),
            jnp.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], dtype=jnp.float32),
        ),
        translate3(-cx, -cy),
    )


def rotate3(angle_deg, center_xy) -> jnp.ndarray:
    return _to_3x3(rotation_matrix(angle_deg, center_xy))


def hflip3(width: float) -> jnp.ndarray:
    return jnp.array([[-1, 0, width - 1], [0, 1, 0], [0, 0, 1]], dtype=jnp.float32)


def vflip3(height: float) -> jnp.ndarray:
    return jnp.array([[1, 0, 0], [0, -1, height - 1], [0, 0, 1]], dtype=jnp.float32)
