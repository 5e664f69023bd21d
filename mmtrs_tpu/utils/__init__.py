from mmtrs_tpu.utils.io import (
    ensure_dir,
    save_json,
    load_json,
    timestamp,
    read_table,
    write_table,
)
from mmtrs_tpu.utils.rng import key_for_origin, split_keys

__all__ = [
    "ensure_dir",
    "save_json",
    "load_json",
    "timestamp",
    "read_table",
    "write_table",
    "key_for_origin",
    "split_keys",
]
