"""Seeded RNG discipline.

The reference derives a deterministic per-image RNG stream as
``seed * 1000003 + origin_id`` (augment_records.py:476) so augmentation is
reproducible per lineage regardless of iteration order. The JAX equivalent
folds the origin id into a base key — same property, idiomatic ``jax.random``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RNG_STRIDE = 1000003


def key_for_origin(seed: int, origin_id, aug_idx=0) -> jax.Array:
    """Deterministic key per (seed, origin_id, aug_idx) lineage.

    ``origin_id``/``aug_idx`` may be python ints or traced int arrays, making
    this usable inside jit-compiled batched augmentation.
    """
    base = jax.random.key(seed)
    k = jax.random.fold_in(base, jnp.asarray(origin_id, dtype=jnp.uint32) * RNG_STRIDE)
    return jax.random.fold_in(k, jnp.asarray(aug_idx, dtype=jnp.uint32))


def split_keys(key: jax.Array, n: int) -> jax.Array:
    return jax.random.split(key, n)


def keys_for_batch(seed: int, origin_ids, aug_idxs) -> jax.Array:
    """Vectorized per-sample keys for a batch (vmapped fold-in)."""
    return jax.vmap(lambda o, a: key_for_origin(seed, o, a))(
        jnp.asarray(origin_ids), jnp.asarray(aug_idxs)
    )
