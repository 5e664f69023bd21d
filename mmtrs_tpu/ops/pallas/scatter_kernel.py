"""In-place batch-row scatter via input_output_aliases (round 5).

STATUS — measured NEGATIVE on-chip, NOT wired into subset_apply.
scripts/exp_scatter_r5.py (v5e, b128@512² u8, cap 39): gather+scatter
4.37 ms vs XLA `.at[idx].set` 2.28; full subset op 7.4 vs production 5.8.
The input/output alias does not survive the surrounding jit graph — the
pallas_call still materializes a full-batch output buffer (copy) and then
pays per-row DMA scheduling on top. Kept as a documented negative result
and as the only in-repo example of input_output_aliases + scalar-prefetch
indexed output blocks; do not re-wire without re-measuring.

``subset_apply`` (ops/augment.py) compacts the ≤cap firing rows of a batch,
runs the op on the small sub-batch, and scatters the results back. The
scatter-back was its hidden cost: ``x.at[idx].set(sub)`` lowers to an XLA
scatter that cannot alias its operand inside the surrounding jit graph, so
XLA materializes a full copy of the batch first — measured 2.59 ms at
b128@512² u8 for a gather+scatter that moves only cap≈21 real rows
(scripts/exp_subset_r5.py V4). Four subset sites run per chain step
(deskew + 3 photometric subsets): ~8 ms of pure copy.

This kernel writes the sub-rows straight into the destination buffer via
``input_output_aliases`` — the output IS the input buffer, grid steps DMA
one [1, H, L] row-block each to row ``idx[k]``, and the untouched rows are
never read or written. Cost: cap rows of traffic instead of B.

Contract: ``idx`` must be duplicate-free (subset_apply's argsort indices
are). Rows land bit-exactly; non-indexed rows are byte-identical because
the aliased buffer is simply not touched there. The uncapped-overflow
cond branch in subset_apply keeps the XLA path.

Reference anchor: this replaces the scatter half of the subset machinery
that implements the reference's per-image probabilistic augmentation gates
(augmentation.py:61-116 — torch applies ops image-by-image on CPU; the
TPU design batches, compacts, and scatters instead).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, dst_hbm_ref, sub_ref, out_ref):
    del idx_ref, dst_hbm_ref  # dst only participates via aliasing
    out_ref[...] = sub_ref[...]


def scatter_rows_supported(shape: tuple, dtype) -> bool:
    """True when a [B, ...] array can take the in-place row scatter: rows
    flatten to [H, L] with native-tile-aligned dims (u8 (32,128) /
    f32 (8,128) min tiles — keep one conservative gate for both)."""
    if len(shape) < 3:
        return False
    H = shape[1]
    L = 1
    for d in shape[2:]:
        L *= d
    if dtype == jnp.uint8:
        return H % 32 == 0 and L % 128 == 0
    if dtype == jnp.float32:
        return H % 8 == 0 and L % 128 == 0
    return False


@partial(jax.jit, static_argnames=("interpret",))
def scatter_rows_pallas(
    dst: jnp.ndarray,
    sub: jnp.ndarray,
    idx: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Return ``dst`` with ``dst[idx[k]] = sub[k]`` — in place (aliased).

    dst: [B, ...]; sub: [cap, ...] same trailing shape; idx: [cap] unique
    int32 row ids. The caller must not reuse the ``dst`` value afterwards
    (jit donates the buffer to the pallas call).
    """
    B = dst.shape[0]
    cap = sub.shape[0]
    assert sub.shape[1:] == dst.shape[1:] and idx.shape == (cap,)
    assert scatter_rows_supported(dst.shape, dst.dtype), (dst.shape, dst.dtype)
    H = dst.shape[1]
    L = math.prod(dst.shape[2:])
    d2 = dst.reshape(B, H, L)
    s2 = sub.reshape(cap, H, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # dst: alias only, no DMA
            pl.BlockSpec((1, H, L), lambda k, idx_ref: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, L), lambda k, idx_ref: (idx_ref[k], 0, 0)),
    )
    out = pl.pallas_call(
        _scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, L), dst.dtype),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},  # flat operands: idx=0, dst=1, sub=2
        interpret=interpret,
    )(idx.astype(jnp.int32), d2, s2)
    return out.reshape(dst.shape)
