"""mmtrs_tpu — TPU-native multimodal tooth-restoration-selection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`ahmedmajid92/multimodal-teeth-restoration-selection` (reference mounted read-only
at /root/reference): Direct-vs-Indirect dental restoration classification from
9 clinical tabular features and tooth photographs.

Design stance (see SURVEY.md §7): batch-first and array-resident. Images live as
arrays in HBM; preprocessing / augmentation are jit-compiled pure functions
``f(batch, rng, params) -> batch``; models are Flax modules trained data-parallel
over a 1-D ``data`` mesh with ``jax.sharding``; the tabular GBDT heads and the
late-fusion logistic meta-learner are vectorized JAX so serving has no CPU/GPU
model in the loop.

Subpackages
-----------
- ``config``   — typed configuration (reference: src/config.py + argparse defaults)
- ``utils``    — IO helpers, RNG discipline, logging
- ``metrics``  — binary-classification metrics + threshold selection
- ``data``     — tabular standardization, feature engineering, splits, records
- ``ops``      — Pallas/XLA image kernels (CLAHE, deskew, warp, augment, ...)
- ``models``   — GBDT, linear/calibration, CNN backbones, MIL, MM joint model
- ``train``    — trainers (hard / soft / MIL / MM dual-task / progressive)
- ``fusion``   — OOF stacking, calibration, weight search, inference recipes
- ``parallel`` — mesh construction + data-parallel sharding utilities
- ``serve``    — in-process serving app (UI layer)
"""

__version__ = "0.1.0"
