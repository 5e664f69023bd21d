#!/usr/bin/env python3
"""Raw streaming-bandwidth probes on this chip (round-5 ceiling study).

Every hot chain stage is HBM-streaming-shaped (read ~100 MB of u8 pixels,
write ~100 MB). The round-5 Pallas copy probes measured only ~110 GB/s —
13% of the v5e HBM spec (819 GB/s) — which, if real, puts the whole-chain
speed-of-light near ~20 ms/b128 (≈6,400 imgs/s) for the current ~2.2 GB
of stage traffic. This script pins the platform's actual streaming rate
across dtype/layout/op-shape so the BENCH narrative can say how far the
chain is from the wall of THIS rig (axon-tunneled single chip), not the
wall of a spec sheet:

  - XLA u8/f32 elementwise add (read+write, fused single pass)
  - XLA u8→f32 widen (the train-side promotion)
  - XLA u8 copy via i32-word view (4-byte lanes — tests whether 1-byte
    lane layout is what throttles u8 streams)
  - Pallas u8 copy at several row-block granularities (DMA overhead)
  - Pallas u8 copy through an i32-word view

Writes reports/exp_bw_r5.json. Run on-chip: python scripts/exp_bw_r5.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W = 128, 512, 512
NB_U8 = B * H * W * 3  # ~100 MB

rec: dict = {"batch": B, "note": "GB/s = bytes_moved / wall; 16-iter steady "
             "state on distinct inputs; axon tunnel, one chip"}


def fetch(o):
    float(np.asarray(jnp.sum(o.reshape(-1)[:4].astype(jnp.float32))))


def timeit(name, fn, xs, bytes_moved, it=16):
    try:
        t0 = time.perf_counter()
        fetch(fn(xs[0]))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(xs[i % 4]) for i in range(it)]
        fetch(outs[-1])
        dt = (time.perf_counter() - t0) / it * 1000
        gbps = bytes_moved / dt / 1e6
        print(f"{name:46s} {dt:7.2f} ms  {gbps:7.1f} GB/s  [compile {tc:.0f}s]",
              flush=True)
        rec[name] = {"ms": round(dt, 2), "gbps": round(gbps, 1)}
    except Exception as e:  # structured failure, never ANSI tracebacks
        msg = f"{type(e).__name__}: {str(e)[:140]}"
        print(f"{name:46s} FAILED {msg}", flush=True)
        rec[name] = {"error": msg}


def main() -> int:
    xs_u8 = [jnp.full((B, H, W, 3), i, jnp.uint8) for i in range(4)]
    xs_f32 = [x.astype(jnp.float32) for x in xs_u8]

    timeit("XLA u8 add1 (r+w 200MB)", jax.jit(lambda x: x + jnp.uint8(1)),
           xs_u8, 2 * NB_U8)
    timeit("XLA f32 add1 (r+w 800MB)", jax.jit(lambda x: x + 1.0),
           xs_f32, 8 * NB_U8)
    timeit("XLA u8->f32 widen (r100+w400)",
           jax.jit(lambda x: x.astype(jnp.float32) + 1.0), xs_u8, 5 * NB_U8)
    timeit("XLA u8 2-op fused (r+w 200MB)",
           jax.jit(lambda x: (x + jnp.uint8(1)) * jnp.uint8(2)),
           xs_u8, 2 * NB_U8)
    timeit("XLA i32-view add (r+w 200MB)",
           jax.jit(lambda x: jax.lax.bitcast_convert_type(
               x.reshape(B, H, W * 3 // 4, 4), jnp.int32) + 1),
           xs_u8, 2 * NB_U8)

    def make_pallas_copy(rows, as_i32=False):
        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        lanes = W * 3 // 4 if as_i32 else W * 3
        dt = jnp.int32 if as_i32 else jnp.uint8

        @jax.jit
        def fn(x):
            v = x.reshape(B, H, W * 3)
            if as_i32:
                v = jax.lax.bitcast_convert_type(
                    v.reshape(B, H, lanes, 4), jnp.int32)
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((B, H, lanes), dt),
                grid=(B * H // rows,),
                in_specs=[pl.BlockSpec(
                    (1, rows, lanes),
                    lambda i: (i // (H // rows), i % (H // rows), 0))],
                out_specs=pl.BlockSpec(
                    (1, rows, lanes),
                    lambda i: (i // (H // rows), i % (H // rows), 0)),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(v)
            return out
        return fn

    for rows in (128, 256, 512):
        timeit(f"Pallas u8 copy rows={rows} ({B*H//rows} steps)",
               make_pallas_copy(rows), xs_u8, 2 * NB_U8)
    timeit("Pallas i32-view copy rows=256",
           make_pallas_copy(256, as_i32=True), xs_u8, 2 * NB_U8)

    out = Path("reports/exp_bw_r5.json")
    out.write_text(json.dumps(rec, indent=2) + "\n")
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
