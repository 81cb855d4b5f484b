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

__all__ = [
    "sharded_scan_fn",
    "sharded_candidates",
    "sharded_tile_counts",
    "shard_grid",
]


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


# ---------------------------------------------------------------------------
# Two-phase sharded scan: the multi-device twin of the single-device design
# (device tile-count prefilter + host hot-tile extraction, ``dense.py``),
# replacing on-device offset compaction with 4-bytes-per-tile counts.


def shard_grid(arr: np.ndarray, mesh: Mesh, tile_elems: int):
    """Pad a host element array to whole per-device tile spans and place it
    sharded across the mesh's data axis.  Returns (device_array, T) where T
    is the number of counted tiles covering ``len(arr)`` elements."""
    import jax

    from jax.sharding import NamedSharding

    n = len(arr)
    d = mesh.shape[DATA_AXIS]
    t_total = max(1, -(-n // tile_elems))
    t_loc = -(-t_total // d)
    padded = d * t_loc * tile_elems
    if padded != n:
        arr = np.pad(arr, (0, padded - n))
    dev = jax.device_put(arr, NamedSharding(mesh, P(DATA_AXIS)))
    return dev, t_total


def _sharded_counts_fn(mesh: Mesh, pairs, length: int, tile_elems: int):
    """Jitted SPMD phase-1 prefilter: each device counts matches per tile in
    its shard, with a one-ICI-hop ``ppermute`` halo of one tile from the
    right neighbor (the collective analog of the reference's overlapping
    block reads, ``search_engine.cpp:223-252``)."""
    import jax

    from ..ops.scan_jnp import _count_body

    n_dev = mesh.shape[DATA_AXIS]
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_counts(d_local, valid_local, expected):
        # d_local: [T_loc * tile_elems]; valid_local: [1] int32 (the number
        # of valid elements relative to this shard's base, pre-clipped on
        # host so int32 never overflows on huge corpora)
        halo = jax.lax.ppermute(d_local[:tile_elems], DATA_AXIS, perm)
        ext = jnp.concatenate([d_local, halo])
        counts = _count_body(
            ext, valid_local[0], expected, pairs, length, tile_elems
        )
        return counts[None]

    mapped = jax.shard_map(
        local_counts,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=64)
def _cached_counts_fn(mesh, pairs, length, tile_elems):
    return _sharded_counts_fn(mesh, pairs, length, tile_elems)


def sharded_tile_counts(
    pat: CompiledPattern,
    data,
    mesh: Mesh,
    valid_count: int,
    tile_elems: int,
) -> np.ndarray:
    """Phase 1 across a mesh: int32[T] per-tile prefilter match counts for
    the whole corpus in ONE collective dispatch.

    ``data`` is either a host element array (placed sharded on first use) or
    a device array already produced by :func:`shard_grid`.  Same count
    contract as ``dense.tile_counts``; exact offsets are recovered on host
    from the hot tiles only.
    """
    import jax

    if isinstance(data, np.ndarray):
        dev, t_total = shard_grid(
            np.ascontiguousarray(data, dtype=pat.dtype), mesh, tile_elems
        )
    else:
        dev, t_total = data, max(1, -(-valid_count // tile_elems))
    d = mesh.shape[DATA_AXIS]
    shard = dev.shape[0] // d

    from ..ops.scan_jnp import prefilter_checks
    from jax.sharding import NamedSharding

    bases = np.arange(d, dtype=np.int64) * shard
    valid_local = np.clip(
        valid_count - bases, 0, shard + tile_elems
    ).astype(np.int32)
    valid_dev = jax.device_put(
        valid_local, NamedSharding(mesh, P(DATA_AXIS))
    )
    pairs, exp_sel = prefilter_checks(pat)
    fn = _cached_counts_fn(mesh, pairs, pat.length, tile_elems)
    counts = fn(dev, valid_dev, jnp.asarray(exp_sel))
    return np.asarray(counts).reshape(-1)[:t_total]


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
