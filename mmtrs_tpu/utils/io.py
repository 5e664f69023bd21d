"""Artifact IO: JSON summaries, CSV/XLSX metadata tables, directory helpers.

Reference: src/utils/io.py:8-24 (ensure_dir/save_json/timestamp) and the
table conventions of augment_records.py:45-59 (read_table/write_table that
accept either .csv or .xlsx). XLSX support is gated on openpyxl being
importable (it is absent in this image); CSV is always written, which keeps
the artifact schema contract while staying dependency-light.
"""

from __future__ import annotations

import json
import shutil
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

try:  # pragma: no cover - environment dependent
    import openpyxl  # noqa: F401

    _HAS_XLSX = True
except Exception:  # pragma: no cover
    _HAS_XLSX = False


def ensure_dir(path: str | Path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def timestamp() -> str:
    """UTC ISO timestamp, filesystem-safe (reference: src/utils/io.py:15-17)."""
    return datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")


class _NumpyEncoder(json.JSONEncoder):
    def default(self, o: Any) -> Any:
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, Path):
            return str(o)
        return super().default(o)


def save_json(obj: Any, path: str | Path, indent: int = 2) -> Path:
    p = Path(path)
    ensure_dir(p.parent)
    with open(p, "w") as f:
        json.dump(obj, f, indent=indent, cls=_NumpyEncoder)
    return p


def load_json(path: str | Path) -> Any:
    with open(path) as f:
        return json.load(f)


def copy_with_new_name(src: str | Path, dst_dir: str | Path, new_name: str) -> Path:
    dst = ensure_dir(dst_dir) / new_name
    shutil.copy2(src, dst)
    return dst


def read_table(path: str | Path) -> pd.DataFrame:
    """Read a metadata table from .csv or .xlsx (reference: augment_records.py:45-52)."""
    p = Path(path)
    if p.suffix.lower() in (".xlsx", ".xls"):
        if not _HAS_XLSX:
            # Fall back to a sibling CSV if one exists (the reference always
            # writes CSV+XLSX pairs — augment_records.py:54-59).
            csv = p.with_suffix(".csv")
            if csv.exists():
                return pd.read_csv(csv)
            raise RuntimeError(
                f"openpyxl unavailable and no CSV sibling for {p}; "
                "re-export the table as CSV"
            )
        return pd.read_excel(p)
    return pd.read_csv(p)


def write_table(df: pd.DataFrame, path: str | Path, also_xlsx: bool = True) -> list[Path]:
    """Write a table as CSV (+ XLSX when supported), reference-style pair."""
    p = Path(path)
    ensure_dir(p.parent)
    written: list[Path] = []
    csv = p.with_suffix(".csv")
    df.to_csv(csv, index=False)
    written.append(csv)
    if also_xlsx and _HAS_XLSX:  # pragma: no cover - environment dependent
        xlsx = p.with_suffix(".xlsx")
        df.to_excel(xlsx, index=False)
        written.append(xlsx)
    return written
