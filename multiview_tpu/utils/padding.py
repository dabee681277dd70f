"""Shape-bucketing helpers (compile hygiene).

On TPU every new input shape is a compile; variable-length batches are
padded to power-of-2 buckets so one executable serves all sizes (see
CLAUDE.md "Compile hygiene").
"""

from __future__ import annotations

import numpy as np


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (>= 1)."""
    b = 1
    while b < n:
        b *= 2
    return b


def pad_rows_pow2(arr: np.ndarray, fill=0) -> np.ndarray:
    """Zero-(or fill-)pad axis 0 to the next power of two."""
    arr = np.asarray(arr)
    nb = next_pow2(arr.shape[0])
    if nb == arr.shape[0]:
        return arr
    out = np.full((nb,) + arr.shape[1:], fill, arr.dtype)
    out[:arr.shape[0]] = arr
    return out
