"""Sharded dense scan over a device mesh (layer L4).

The TPU-native counterpart of the reference's block/thread-pool runtime
(``src/core/search_engine.cpp:82-175``): the element array is sharded across
the mesh's "data" axis; each device scans its shard plus a halo of
``pattern_len - 1`` elements fetched from its right neighbor with
``lax.ppermute`` (one ICI hop) — mirroring the reference's overlapping block
reads (``search_engine.cpp:223-252``).  Every match is found by exactly one
shard (the one whose base region contains its start), so no dedup is needed;
per-shard fixed-capacity candidate buffers are returned sharded and
concatenated on host (the collective analog of the reference's future
harvesting + merge, ``search_engine.cpp:83-102``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scan_jnp import match_bitmap, compact_matches, pattern_device_args
from ..pattern import CompiledPattern
from .mesh import DATA_AXIS

__all__ = ["sharded_scan_fn", "sharded_candidates"]


def sharded_scan_fn(
    mesh: Mesh, length: int, signed_compare: bool, capacity: int
):
    """Build the jitted SPMD scan step for a given mesh/pattern shape.

    Returns ``fn(data, valid, shift_cur, shift_prev, expected, recovery)``
    with ``data`` length divisible by the mesh size; output arrays are
    per-shard stacked: counts [D], offsets [D, capacity] (global element
    offsets, -1 fill), values [D, capacity, 2].
    """
    halo = length - 1
    n_dev = mesh.shape[DATA_AXIS]

    def local_scan(d_local, valid, sc, sp, exp, rec):
        # d_local: [shard] — this device's slice of the corpus.
        shard = d_local.shape[0]
        my = jax.lax.axis_index(DATA_AXIS)

        # Halo exchange: receive the first ``halo`` elements of the right
        # neighbor (one ICI neighbor permute; wraps at the boundary, where the
        # stale values are masked off by the global valid count).
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        halo_elems = jax.lax.ppermute(d_local[:halo], DATA_AXIS, perm)
        ext = jnp.concatenate([d_local, halo_elems])  # [shard + halo]

        base = (my * shard).astype(jnp.int32)
        # Windows starting inside this shard; global validity via local count.
        valid_local = jnp.clip(valid - base, 0, shard + halo)
        bitmap = match_bitmap(
            ext, valid_local, length, sc, sp, exp, signed_compare
        )
        count, offsets = compact_matches(bitmap, capacity)
        values = ext[
            jnp.clip(jnp.maximum(offsets, 0)[:, None] + rec[None, :], 0,
                     shard + halo - 1)
        ]
        offsets_global = jnp.where(offsets >= 0, offsets + base, -1)
        return count[None], offsets_global[None], values[None]

    mapped = jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=64)
def _cached_fn(mesh, length, signed_compare, capacity):
    return sharded_scan_fn(mesh, length, signed_compare, capacity)


def sharded_candidates(
    pat: CompiledPattern,
    data: np.ndarray,
    mesh: Mesh,
    capacity_per_shard: int = 16384,
) -> Tuple[np.ndarray, np.ndarray]:
    """All matching offsets of *data* scanned across *mesh*.

    Host-facing convenience used by the engine's multi-device path and the
    partitioning-invariance tests: pads to shard divisibility, runs the SPMD
    step, concatenates + filters per-shard buffers.
    """
    data = np.ascontiguousarray(data, dtype=pat.dtype)
    n = len(data)
    if n < pat.length:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2), dtype=np.int64)
    d = len(mesh.devices)
    shard = -(-n // d)
    padded = shard * d
    if padded != n:
        data = np.pad(data, (0, padded - n))

    fn = _cached_fn(mesh, pat.length, pat.signed_compare, capacity_per_shard)
    sc, sp, exp, rec = pattern_device_args(pat)
    counts, offsets, values = fn(
        jnp.asarray(data), jnp.int32(n), sc, sp, exp, rec
    )
    counts = np.asarray(counts)
    if int(counts.max(initial=0)) > capacity_per_shard:
        return sharded_candidates(
            pat, data[:n], mesh, capacity_per_shard * 4
        )
    offs = np.asarray(offsets).reshape(-1)
    vals = np.asarray(values).reshape(-1, 2)
    keep = offs >= 0
    offs, vals = offs[keep].astype(np.int64), vals[keep].astype(np.int64)
    order = np.argsort(offs, kind="stable")
    return offs[order], vals[order]
