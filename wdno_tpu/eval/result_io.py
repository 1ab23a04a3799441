"""Nested results store with recursive merge.

Equivalent of the reference's YAML result merging
(``burgers/ddpm_burgers/result_io.py:12-82``): results accumulate in one
file keyed by experiment/config with {mean, std} leaves; re-running merges
instead of overwriting.  Uses JSON (yaml optional) for zero extra deps.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

__all__ = ["data_merge", "merge_save_dict", "save_acc", "load_results"]


def data_merge(old: Dict, new: Dict) -> Dict:
    """Recursively merge ``new`` into ``old`` (new wins at leaves)."""
    out = dict(old)
    for k, v in new.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = data_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_results(path: str) -> Dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f) or {}
    return {}


def merge_save_dict(path: str, new: Dict) -> Dict:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    merged = data_merge(load_results(path), _to_jsonable(new))
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    return merged


def save_acc(values, path: str, *keys: str) -> Dict:
    """Store {mean, std, median, p90} of ``values`` under nested ``keys``
    (reference ``save_acc`` ``result_io.py:74-82`` stores mean/std; median
    and p90 are added so tail-heavy metrics — e.g. per-sample SR MSE with
    occasional diverged refinements — are diagnosable from the store)."""
    values = np.asarray(values)
    leaf = {
        "mean": float(values.mean()),
        "std": float(values.std()),
        "median": float(np.median(values)),
        "p90": float(np.percentile(values, 90)),
    }
    d: Dict[str, Any] = leaf
    for k in reversed(keys):
        d = {str(k): d}
    return merge_save_dict(path, d)


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj
