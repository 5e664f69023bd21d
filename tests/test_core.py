"""Core layer: config serialization, IO helpers, RNG discipline."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from mmtrs_tpu.config import (
    GBDTConfig,
    PreprocessConfig,
    config_to_json,
    config_from_dict,
)
from mmtrs_tpu.utils import (
    ensure_dir,
    save_json,
    load_json,
    read_table,
    write_table,
    key_for_origin,
)
from mmtrs_tpu.utils.rng import keys_for_batch


def test_config_roundtrip():
    cfg = GBDTConfig.lgbm_like()
    d = json.loads(config_to_json(cfg))
    back = config_from_dict(GBDTConfig, d)
    assert back == cfg
    assert back.objective == "soft_regression"
    assert back.consensus_power == 0.5


def test_preprocess_defaults_match_reference():
    cfg = PreprocessConfig()
    # src/config.py:14-18
    assert cfg.min_edge_px == 400
    assert cfg.output_size == 512
    assert cfg.clahe_clip == 3.0
    assert cfg.clahe_tiles == (8, 8)
    assert cfg.rot_tolerance_deg == 15.0
    assert cfg.crop_margin_px == 15


def test_json_io_roundtrip(tmp_path):
    obj = {"a": np.float32(1.5), "b": np.arange(3), "c": [1, 2]}
    p = save_json(obj, tmp_path / "sub" / "x.json")
    back = load_json(p)
    assert back == {"a": 1.5, "b": [0, 1, 2], "c": [1, 2]}


def test_table_roundtrip(tmp_path):
    df = pd.DataFrame({"image_name": ["1.jpg", "2.jpg"], "y": [0, 1]})
    written = write_table(df, tmp_path / "t.csv")
    back = read_table(written[0])
    pd.testing.assert_frame_equal(back, df)


def test_rng_keys_deterministic_and_distinct():
    k1 = key_for_origin(42, 7, 0)
    k2 = key_for_origin(42, 7, 0)
    k3 = key_for_origin(42, 8, 0)
    k4 = key_for_origin(42, 7, 1)
    d1, d2, d3, d4 = (jax.random.key_data(k) for k in (k1, k2, k3, k4))
    assert (d1 == d2).all()
    assert not (d1 == d3).all()
    assert not (d1 == d4).all()


def test_rng_batch_keys_match_scalar_path():
    ks = keys_for_batch(42, np.array([3, 5]), np.array([0, 2]))
    k3 = key_for_origin(42, 3, 0)
    assert (jax.random.key_data(ks[0]) == jax.random.key_data(k3)).all()
    # usable for sampling
    u = jax.vmap(lambda k: jax.random.uniform(k))(ks)
    assert u.shape == (2,)
    assert jnp.all((u >= 0) & (u < 1))


def test_structured_logger_roundtrip(tmp_path):
    from mmtrs_tpu.utils.profiling import StructuredLogger

    log = StructuredLogger(tmp_path / "m" / "metrics.jsonl")
    log.log("fold_done", fold=0, val_auc=0.91)
    log.log("epoch", fold=0, imgs_per_sec=123.4, note=object())  # non-JSON coerced
    recs = log.read()
    assert [r["event"] for r in recs] == ["fold_done", "epoch"]
    assert recs[0]["val_auc"] == 0.91 and "ts" in recs[0]
    assert isinstance(recs[1]["note"], str)


def test_profiler_trace_writes_artifacts(tmp_path):
    import jax.numpy as jnp

    from mmtrs_tpu.utils.profiling import annotate, trace

    with trace(tmp_path / "tr"):
        with annotate("tiny_op"):
            (jnp.ones((8, 8)) * 2).block_until_ready()
    # jax.profiler writes a plugins/profile/<run>/ tree with .xplane.pb
    found = list((tmp_path / "tr").rglob("*.xplane.pb"))
    assert found, "no profiler artifact written"
