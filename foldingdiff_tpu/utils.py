"""
Shared host-side utility functions.

Capability parity with reference foldingdiff/utils.py (angular wrap primitive,
grouping helpers, config merging, source hashing). The angular wrap is the
load-bearing primitive reused by noising, losses, sampling, and mean-offset
shifting (reference: foldingdiff/utils.py:87-121).
"""
from __future__ import annotations

import glob
import hashlib
import logging
import os
from typing import Any, Dict, List, Literal, Sequence

import numpy as np


def modulo_with_wrapped_range(vals, range_min: float = -np.pi, range_max: float = np.pi):
    """
    Modulo with a wrapped (possibly negative-min) range.

    Works on python scalars, numpy arrays, and jax arrays alike: only uses
    `-`, `%`, `+`, which all follow floored-modulo semantics in numpy/jax/torch.

    >>> modulo_with_wrapped_range(3, -2, 2)
    -1
    """
    assert range_min <= 0.0
    assert range_min < range_max
    top = range_max - range_min
    return ((vals - range_min) % top) + range_min


def wrapped_mean(x: np.ndarray, axis=None) -> np.ndarray:
    """
    Circular mean: atan2 of the mean sine and cosine, NaN-tolerant.
    Reference: foldingdiff/custom_metrics.py:85-94.
    """
    sin = np.nanmean(np.sin(x), axis=axis)
    cos = np.nanmean(np.cos(x), axis=axis)
    return np.arctan2(sin, cos)


def num_to_groups(num: int, divisor: int) -> List[int]:
    """
    Split `num` into chunks of at most `divisor` that sum to `num`.

    >>> num_to_groups(18, 16)
    [16, 2]
    >>> num_to_groups(33, 8)
    [8, 8, 8, 8, 1]
    """
    groups, remainder = divmod(num, divisor)
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    assert sum(arr) == num
    return arr


def seq_to_groups(seq: Sequence[Any], divisor: int) -> List[Sequence[Any]]:
    """
    Split a sequence into chunks of at most `divisor` items.

    >>> seq_to_groups([1,2,3,4,5,6,7,8,9], 3)
    [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    >>> seq_to_groups([1,2,3,4,5,6,7,8,9], 4)
    [[1, 2, 3, 4], [5, 6, 7, 8], [9]]
    """
    return [seq[i : i + divisor] for i in range(0, len(seq), divisor)]


def tolerant_comparison_check(values, cmp: Literal[">=", "<="], v) -> bool:
    """
    Bound check tolerant of float32 rounding at the boundary.

    >>> tolerant_comparison_check(-3.1415927410125732, ">=", -np.pi)
    True
    """
    if cmp == ">=":
        diff = np.nanmin(values) - v
        return bool(np.isclose(diff, 0, atol=1e-5) or diff > 0)
    elif cmp == "<=":
        diff = np.nanmax(values) - v
        return bool(np.isclose(diff, 0, atol=1e-5) or diff < 0)
    raise ValueError(f"Illegal comparator: {cmp}")


def update_dict_nonnull(d: Dict[str, Any], vals: Dict[str, Any]) -> Dict[str, Any]:
    """
    Merge `vals` into `d`, skipping None overrides for existing keys.

    >>> update_dict_nonnull({'a': 1, 'b': 2}, {'b': 3, 'c': 4})
    {'a': 1, 'b': 3, 'c': 4}
    """
    for k, v in vals.items():
        if k in d:
            if d[k] != v and v is not None:
                logging.info(f"Replacing key {k} original value {d[k]} with {v}")
                d[k] = v
        else:
            d[k] = v
    return d


def md5_all_py_files(dirname: str) -> str:
    """One md5 over all .py files in a directory, for dataset-cache invalidation."""
    fnames = sorted(glob.glob(os.path.join(dirname, "*.py")))
    hash_md5 = hashlib.md5()
    for fname in fnames:
        with open(fname, "rb") as f:
            for chunk in iter(lambda: f.read(2**20), b""):
                hash_md5.update(chunk)
    return hash_md5.hexdigest()


def is_huggingface_hub_id(s: str, timeout: float = 5.0) -> bool:
    """
    Whether `s` names a model on the Hugging Face hub (reference
    utils.is_huggingface_hub_id, utils.py:15-24: a live HTTP probe of
    https://huggingface.co/<s>). Returns False for existing local paths,
    structurally un-hub-like strings, and on ANY network failure -- offline
    hosts degrade to local-only loading instead of crashing.
    """
    if os.path.exists(s):
        return False
    parts = s.split("/")
    if len(parts) != 2 or not all(p and not p.startswith(".") for p in parts):
        return False
    try:
        import urllib.request

        req = urllib.request.Request(f"https://huggingface.co/{s}", method="HEAD")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status == 200
    except Exception:
        logging.warning(f"Hub probe for {s} failed (offline?); treating as local path")
        return False
