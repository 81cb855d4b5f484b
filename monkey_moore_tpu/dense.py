"""Single-device dense search (layer L2 public surface).

``dense_search`` is the TPU-path equivalent of ``MonkeyMoore<Ty>::search``
(``src/core/monkey_moore.cpp:41-49``): in-memory element array in, list of
(offset, equivalency_map) out.  The scan runs as one jitted dispatch per
array; suppression and map materialization are O(matches) host work.

The engine (layer L3) does not call this directly — it drives the chunked
pipeline in ``engine.py`` — but this is the convenient library API for
in-memory searches and the conformance-test entry point for the kernels.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import MatchSemantics
from .ops.recover import recover_from_values
from .ops.scan_jnp import pattern_device_args, scan_chunk
from .ops.suppress import greedy_suppress
from .oracle import oracle_search
from .pattern import CompiledPattern

__all__ = ["dense_search", "dense_candidates"]

Result = Tuple[int, Dict[int, int]]


def dense_candidates(
    pat: CompiledPattern,
    data: np.ndarray,
    capacity: int = 65536,
    use_pallas: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """All matching window offsets in *data*, plus recovery values [M, 2].

    Retries with doubled capacity on overflow of the fixed-size device
    match buffer.
    """
    data = np.ascontiguousarray(data, dtype=pat.dtype)
    n = len(data)
    if n < pat.length:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2), dtype=np.int64)

    kernel = _select_kernel(use_pallas)
    sc, sp, exp, rec = pattern_device_args(pat)
    # Pad to the next power-of-two bucket (>=256) so jit executables are
    # shared across data lengths; padded windows are masked via valid_count.
    padded = max(256, 1 << (n - 1).bit_length())
    if padded != n:
        data = np.pad(data, (0, padded - n))
    d = jnp.asarray(data)
    valid = jnp.int32(n)
    while True:
        count, offsets, values = kernel(
            d,
            valid,
            sc,
            sp,
            exp,
            rec,
            length=pat.length,
            signed_compare=pat.signed_compare,
            capacity=capacity,
        )
        count = int(count)
        if count <= capacity:
            break
        capacity = max(capacity * 2, 1 << (int(count) - 1).bit_length())
    offsets = np.asarray(offsets[:count], dtype=np.int64)
    values = np.asarray(values[:count], dtype=np.int64)
    return offsets, values


def _select_kernel(use_pallas: bool):
    if use_pallas:
        try:
            from .ops.scan_pallas import scan_chunk_pallas, pallas_available

            if pallas_available():
                return scan_chunk_pallas
        except ImportError:
            pass
    return scan_chunk


def dense_search(
    pat: CompiledPattern,
    data: np.ndarray,
    semantics: MatchSemantics = MatchSemantics.GREEDY,
    capacity: int = 65536,
    use_pallas: bool = True,
) -> List[Result]:
    """Search an in-memory element array; returns [(offset, values_map), ...].

    ``semantics`` selects ALL (every match), GREEDY (dense + advance replay,
    default), or REFERENCE (delegates to the exact sequential walker).
    """
    if pat.length < 2:
        raise ValueError("pattern length must be >= 2")
    if semantics is MatchSemantics.REFERENCE:
        return oracle_search(pat, data)

    offsets, values = dense_candidates(
        pat, data, capacity=capacity, use_pallas=use_pallas
    )
    if semantics is MatchSemantics.GREEDY and len(offsets) > 1:
        kept = greedy_suppress(offsets, pat.advance)
        keep_mask = np.isin(offsets, kept)
        offsets = offsets[keep_mask]
        values = values[keep_mask]

    return [
        (int(o), recover_from_values(pat, values[i]))
        for i, o in enumerate(offsets)
    ]
