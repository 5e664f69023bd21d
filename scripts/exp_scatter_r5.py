#!/usr/bin/env python3
"""Round-5 follow-up experiments after exp_subset_r5/exp_clahe_r5:

1. Does the in-place Pallas row scatter (ops/pallas/scatter_kernel.py)
   actually eliminate the full-batch copy — and does the win survive the
   lax.cond overflow fallback wrapping it? (A cond result cannot alias a
   captured operand, so the cond boundary may force the copy back.)
2. Where does the CLAHE stage's time actually go: the XLA tile relayout
   ([B,H,W]u8 → [B,n_tiles,1,area]) or the kernels? exp_clahe measured
   hist_only=6.25 ms INCLUDING the relayout; this splits them.

Run on the TPU:  python scripts/exp_scatter_r5.py [batch]
Writes reports/exp_scatter_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fetch_scalar(out):
    leaf = jax.tree.leaves(out)[0]
    if leaf.ndim >= 2:
        leaf = leaf[(0,) * (leaf.ndim - 2)][:2, :2]
    float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))


def timeit(name, fn, arg_sets, it=16):
    t0 = time.perf_counter()
    _fetch_scalar(fn(*arg_sets[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(it)]
    _fetch_scalar(outs[-1])
    dt = (time.perf_counter() - t0) / it * 1000
    print(f"{name:52s} {dt:8.2f} ms   [compile {compile_s:.0f}s]", flush=True)
    return dt


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.ops.pallas.lab_kernels import clahe_lab_fused
    from mmtrs_tpu.ops.pallas.scatter_kernel import scatter_rows_pallas
    from mmtrs_tpu.utils.rng import keys_for_batch

    assert jax.devices()[0].platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = 512
    x0 = jnp.asarray(synth_batch(B))
    variants = [jnp.clip(x0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
                for i in range(4)]
    args = [(v,) for v in variants]
    keys = keys_for_batch(42, np.arange(B), np.ones(B))

    hole = max(1, S // 24)
    params, nk, use_clahe = A.photometric_params_legacy(keys, S, S, hole)
    cap = A._subset_cap(B, 0.5 / 3.0)
    print(f"B={B} cap(clahe)={cap}", flush=True)

    res = {}

    def op(s):
        return clahe_lab_fused(s, clip=2.0, tiles=(8, 8))

    # S0: correctness — pallas scatter vs .at[].set on-chip
    def s0_pallas(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        return scatter_rows_pallas(v, sub + jnp.uint8(1), idx)

    def s0_xla(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        return v.at[idx].set(sub + jnp.uint8(1))

    got = np.asarray(jax.jit(s0_pallas)(variants[0]))
    want = np.asarray(jax.jit(s0_xla)(variants[0]))
    ok = bool((got == want).all())
    res["s0_bit_equal"] = ok
    print(f"S0 pallas-scatter correctness on-chip: {ok}", flush=True)
    if not ok:
        diff = (got != want).any(axis=(1, 2, 3))
        print(f"   mismatched rows: {np.where(diff)[0][:10]}", flush=True)

    # S1: raw gather+scatter cost — pallas vs XLA (exp_subset V4 rerun)
    def v4(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        return v.at[idx].set(sub)
    res["s1_xla_gather_scatter"] = timeit("S1 XLA gather+scatter (V4 rerun)",
                                          jax.jit(v4), args)

    def s1p(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        return scatter_rows_pallas(v, sub, idx)
    res["s1_pallas_gather_scatter"] = timeit("S1 pallas gather+scatter",
                                             jax.jit(s1p), args)

    # S2: full subset op with pallas scatter, cond kept (production shape)
    def s2(v):
        count = jnp.sum(use_clahe.astype(jnp.int32))
        def subset_path(_):
            idx = jnp.argsort(~use_clahe, stable=True)[:cap]
            sub = jnp.take(v, idx, axis=0)
            sub_out = op(sub)
            keep = use_clahe[idx][:, None, None, None]
            return scatter_rows_pallas(v, jnp.where(keep, sub_out, sub), idx)
        def full_path(_):
            return jnp.where(use_clahe[:, None, None, None], op(v), v)
        return jax.lax.cond(count <= cap, subset_path, full_path, None)
    res["s2_subset_pallas_cond"] = timeit("S2 subset op, pallas scatter + cond",
                                          jax.jit(s2), args)

    # S3: same without the cond (overflow impossible at 4σ cap → what if
    # we simply drop the fallback?)
    def s3(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        sub_out = op(sub)
        keep = use_clahe[idx][:, None, None, None]
        return scatter_rows_pallas(v, jnp.where(keep, sub_out, sub), idx)
    res["s3_subset_pallas_nocond"] = timeit("S3 subset op, pallas scatter no cond",
                                            jax.jit(s3), args)

    # S4: production baseline for comparison (XLA scatter + cond) — V0 rerun
    res["s4_subset_xla_cond"] = timeit(
        "S4 subset op production (V0 rerun)",
        jax.jit(lambda v: A.subset_apply(op, v, use_clahe, cap)), args)

    # ---- CLAHE relayout attribution -----------------------------------
    ty, tx = 8, 8
    th, tw = S // ty, S // tx
    area = th * tw
    lq = variants[0][..., 0]  # any u8 [B,H,W] plane stands in for L

    def tile_fwd(l):
        return (l.reshape(B, ty, th, tx, tw).transpose(0, 1, 3, 2, 4)
                .reshape(B, ty * tx, 1, area))
    res["c0_tile_relayout_fwd"] = timeit(
        "C0 tile relayout fwd (XLA u8 transpose)", jax.jit(tile_fwd),
        [(jnp.clip(lq.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8),)
         for i in range(4)])

    tiled0 = tile_fwd(lq)

    def tile_bwd(t):
        return (t.reshape(B, ty, tx, th, tw).transpose(0, 1, 3, 2, 4)
                .reshape(B, S, S))
    res["c1_tile_relayout_bwd"] = timeit(
        "C1 tile relayout bwd", jax.jit(tile_bwd),
        [(jnp.clip(tiled0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8),)
         for i in range(4)])

    # C2: round-trip (what the CLAHE stage pays in pure relayout)
    res["c2_tile_roundtrip"] = timeit(
        "C2 tile relayout round-trip", jax.jit(lambda l: tile_bwd(tile_fwd(l))),
        [(jnp.clip(lq.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8),)
         for i in range(4)])

    out_p = _REPO / "reports" / "exp_scatter_r5.json"
    out_p.write_text(json.dumps(
        {k: (round(v, 2) if isinstance(v, float) else v)
         for k, v in res.items()}, indent=2))
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
