"""Record-keeping offline augmentation: lineage tables + device-batched images.

TPU-first counterpart of the reference's ``build_augmented_table``
(src/preprocessing/augment_records.py:369-576):

- every original row gets ``origin_id`` (its image_id) and ``aug_idx=0``;
  children 1..N inherit ALL parent metadata plus the parent's split —
  leakage-safe by construction;
- if ``split`` is absent, a grouped train/test split is created over
  originals (GroupShuffleSplit semantics, augment_records.py:426-433);
  ``val_frac>0`` carves a grouped ``val`` out of TRAIN by origin_id
  (augment_records.py:545-560);
- child rows are named ``<stem>__augK.jpg`` (a deliberate design change vs
  the reference's opaque ``<new_id>.jpg`` — lineage is visible in the name;
  the reference keeps lineage only in columns);
- randomness is keyed per (seed, origin_id, aug_idx) via
  :func:`mmtrs_tpu.utils.rng.keys_for_batch` — the JAX equivalent of the
  reference's ``random.Random(seed*1000003 + origin_id)``
  (augment_records.py:476) — so rebuilding the table reproduces identical
  images regardless of batch order;
- unlike the reference's per-image PIL/albumentations loop, children are
  generated in fixed-size device batches through the fused
  :func:`mmtrs_tpu.ops.augment.augment_batch` presets (one compile, static
  shapes, HBM-resident).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np
import pandas as pd

LINEAGE_COLS = ["image_id", "image_name", "origin_id", "aug_idx", "split"]


def to_jpg_name(name: str) -> str:
    """Normalize any image filename to ``<stem>.jpg`` (augment_records.py:40)."""
    return Path(str(name)).stem + ".jpg"


def _grouped_frac_split(ids: np.ndarray, frac: float, seed: int) -> set:
    """Deterministic grouped holdout: pick ``round(frac·n)`` unique ids.

    Matches GroupShuffleSplit(test_size=frac, random_state=seed) semantics
    (group-level shuffle then prefix take) without depending on sklearn here.
    """
    uniq = np.unique(ids)
    rng = np.random.default_rng(seed)
    k = max(1, int(round(frac * len(uniq))))
    return set(rng.permutation(uniq)[:k].tolist())


def build_augmented_table(
    df: pd.DataFrame,
    imgs: np.ndarray,
    n_aug: int = 10,
    preset: str = "ten",
    seed: int = 42,
    test_frac: float = 0.2,
    val_frac: float = 0.0,
    batch_size: int = 32,
    image_writer: Callable[[str, np.ndarray], None] | None = None,
):
    """Build the augmented lineage table + image array.

    Args:
      df: one row per ORIGINAL case; must carry ``image_name`` and/or
          ``image_id``; ``split`` optional (created grouped if absent).
      imgs: ``[n, H, W, 3]`` uint8 originals aligned with ``df`` rows.
      n_aug: children per original.
      preset: ``legacy`` | ``ten`` | ``simple`` | ``none``.
      image_writer: optional ``(name, img_uint8) -> None`` callback invoked
          for every output row (originals included — the reference copies
          originals into the augmented folder, augment_records.py:439-448).

    Returns:
      (table, out_imgs): table rows = originals block then children
      (origin-major, aug_idx ascending); ``out_imgs[i]`` is row i's image.
    """
    import jax.numpy as jnp

    from mmtrs_tpu.ops.augment import augment_batch
    from mmtrs_tpu.utils.rng import keys_for_batch

    if len(df) != len(imgs):
        raise ValueError(f"df has {len(df)} rows but imgs has {len(imgs)}")
    df = df.copy().reset_index(drop=True)

    # --- normalize identity columns (augment_records.py:414-424) ---
    if "image_name" not in df.columns:
        if "image_id" not in df.columns:
            raise ValueError("need image_name or image_id")
        df["image_name"] = df["image_id"].map(lambda x: f"{int(x)}.jpg")
    df["image_name"] = df["image_name"].astype(str).str.lower().map(to_jpg_name)
    if "image_id" not in df.columns:
        df["image_id"] = [
            int("".join(c for c in Path(s).stem if c.isdigit()) or i + 1)
            for i, s in enumerate(df["image_name"])
        ]
    df["image_id"] = df["image_id"].astype(int)
    df["origin_id"] = df["image_id"]
    df["aug_idx"] = 0

    # --- grouped train/test split if absent (augment_records.py:426-433) ---
    if "split" not in df.columns:
        test_ids = _grouped_frac_split(df["origin_id"].to_numpy(), test_frac, seed)
        df["split"] = np.where(df["origin_id"].isin(test_ids), "test", "train")

    # --- children: inherit everything, lineage overridden ---
    child_rows = []
    child_plan = []  # (src_index, origin_id, aug_idx)
    next_id = int(df["image_id"].max()) + 1
    for i, row in df.iterrows():
        stem = Path(row["image_name"]).stem
        for j in range(1, n_aug + 1):
            r = row.copy()
            r["image_id"] = next_id
            r["image_name"] = f"{stem}__aug{j}.jpg"
            r["origin_id"] = int(row["origin_id"])
            r["aug_idx"] = j
            r["split"] = str(row["split"]).lower()
            child_rows.append(r)
            child_plan.append((i, int(row["origin_id"]), j))
            next_id += 1

    # --- device-batched augmentation (fixed shapes: one compile) ---
    out_children = np.empty((len(child_plan),) + imgs.shape[1:], dtype=np.uint8)
    img_size = int(imgs.shape[1])
    # one uint8 host→device transfer of the source set; per-batch selection
    # is then a device gather, and the f32 cast happens on device (the old
    # host-side float cast shipped 4 bytes/px per batch through the tunnel)
    imgs_dev = jnp.asarray(np.ascontiguousarray(np.asarray(imgs, np.uint8)))
    for s in range(0, len(child_plan), batch_size):
        plan = child_plan[s : s + batch_size]
        pad = batch_size - len(plan)
        idxs = [p[0] for p in plan] + [plan[-1][0]] * pad
        origins = np.array([p[1] for p in plan] + [plan[-1][1]] * pad)
        aug_idxs = np.array([p[2] for p in plan] + [plan[-1][2]] * pad)
        # uint8 into the preset: the warp's fused planar resample reads
        # 1-byte pixels on TPU (XLA paths promote to f32 unchanged)
        chunk = imgs_dev[np.asarray(idxs)]
        keys = keys_for_batch(seed, origins, aug_idxs)
        # ten/simple select their fixed variant by (aug_idx-1) so n_aug=10
        # covers all ten reference variants (fixed_ten_variants :216-332)
        out = augment_batch(
            chunk, keys, preset, aug_idx=aug_idxs - 1, img_size=img_size
        )
        # quantize to uint8 ON DEVICE: the device→host fetch (the expensive
        # hop on a tunneled TPU) then moves 1 byte/px instead of 4
        arr = np.asarray(jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8))
        out_children[s : s + len(plan)] = arr[: len(plan)]

    table = pd.concat([df, pd.DataFrame(child_rows)], ignore_index=True)
    out_imgs = np.concatenate([np.asarray(imgs, dtype=np.uint8), out_children])

    # --- grouped val inside TRAIN (augment_records.py:545-560) ---
    if val_frac > 0:
        tr_mask = table["split"].astype(str).str.lower().eq("train")
        fams = table.loc[tr_mask, "origin_id"].to_numpy()
        if len(fams):
            val_ids = _grouped_frac_split(fams, val_frac, seed)
            table.loc[table["origin_id"].isin(val_ids) & tr_mask, "split"] = "val"

    lead = [c for c in LINEAGE_COLS if c in table.columns]
    table = table[lead + [c for c in table.columns if c not in lead]]

    if image_writer is not None:
        for name, img in zip(table["image_name"], out_imgs):
            image_writer(name, img)
    return table, out_imgs
