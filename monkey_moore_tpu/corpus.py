"""Resident device corpus.

The interactive workflow this framework is built for — explore a ROM by
searching many keywords — uploads the corpus to device HBM **once** and then
runs every scan against the resident bytes.  On the TPU tunnel used for
development, host→device transfer runs at ~1 GB/s while the resident scan
sustains an order of magnitude more, so residency dominates interactive
latency.  (The reference re-reads the file from disk per search,
``src/core/search_engine.cpp:120-127``.)

A process-wide cache holds the most recent corpus, keyed by
(path, size, mtime); 16-bit element grids for either endianness/alignment
are derived on device per chunk from the resident byte array.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .config import Endianness

__all__ = ["ResidentCorpus", "get_resident_corpus", "clear_corpus_cache"]

_cache: dict = {}


class ResidentCorpus:
    """Device-resident padded byte array for one file."""

    def __init__(self, data_bytes: np.ndarray, pad_bytes: int):
        import jax
        import jax.numpy as jnp

        self.n_bytes = len(data_bytes)
        padded = np.zeros(self.n_bytes + pad_bytes, dtype=np.uint8)
        padded[: self.n_bytes] = data_bytes
        self.device_bytes = jax.device_put(jnp.asarray(padded))
        jax.block_until_ready(self.device_bytes)

    def grid_chunk(
        self,
        element_width: int,
        endianness: Endianness,
        align: int,
        e_start: int,
        want_elems: int,
        packed: bool = False,
    ):
        """Device element array of ``want_elems`` elements of the
        (alignment, endianness) grid starting at element ``e_start``.
        Reads past EOF yield padding zeros (masked by the caller's
        valid count).

        ``packed=True`` emits the SWAR kernel's little-endian int32 word
        layout instead (4 bytes / 2 elements per word), fused into the same
        device pass — no extra packing sweep before the scan."""
        return _grid_fn()(
            self.device_bytes,
            align + e_start * element_width,
            s=element_width,
            big=endianness is Endianness.BIG,
            want=want_elems,
            packed=packed,
        )


@functools.lru_cache(maxsize=1)
def _grid_fn():
    import jax
    import jax.numpy as jnp

    @functools.partial(
        jax.jit, static_argnames=("s", "big", "want", "packed")
    )
    def grid_on_device(device_bytes, byte_start, *, s, big, want, packed):
        raw = jax.lax.dynamic_slice(device_bytes, (byte_start,), (want * s,))
        if packed:
            # little-endian i32 words of the element stream (SWAR layout);
            # for big-endian 16-bit grids the element bytes swap in place
            order = (1, 0, 3, 2) if (s == 2 and big) else (0, 1, 2, 3)
            parts = raw.reshape(-1, 4).astype(jnp.uint32)
            word = parts[:, order[0]]
            for j in (1, 2, 3):
                word = word | (parts[:, order[j]] << jnp.uint32(8 * j))
            return jax.lax.bitcast_convert_type(word, jnp.int32)
        if s == 1:
            return raw
        lo = raw[0::2].astype(jnp.uint16)
        hi = raw[1::2].astype(jnp.uint16)
        if big:
            return (lo << 8) | hi
        return lo | (hi << 8)

    return grid_on_device


def get_resident_corpus(
    path, file_size: int, limit_bytes: int, pad_bytes: int
) -> Optional[ResidentCorpus]:
    """Cached resident corpus for *path*, or None when over the limit or the
    device rejects the allocation.  Holds one corpus (the most recent)."""
    if limit_bytes <= 0 or file_size > limit_bytes or file_size == 0:
        return None
    p = Path(path)
    try:
        stat = p.stat()
    except OSError:
        return None
    key = (str(p.resolve()), stat.st_size, stat.st_mtime_ns)
    hit = _cache.get(key)
    if hit is not None and len(hit.device_bytes) >= file_size + pad_bytes:
        return hit
    try:
        data = np.fromfile(p, dtype=np.uint8)
        corpus = ResidentCorpus(data, pad_bytes)
    except Exception:
        return None
    _cache.clear()
    _cache[key] = corpus
    return corpus


def clear_corpus_cache() -> None:
    _cache.clear()
