"""Pallas TPU tile-count kernel — the hot loop of the framework.

One pass over HBM: each grid step loads a (TILE_ROWS, LANES) tile of elements
into VMEM, evaluates every window start in the tile against the compiled
check tables with purely-VPU shifted compares, and writes a single int32
match count.  Cross-tile windows are handled by also loading the first row of
the next tile (a (1, LANES) fetch — halo traffic is 1/TILE_ROWS of the data).

This is the TPU-native replacement for the reference's Boyer-Moore scan loops
(``src/core/monkey_moore.cpp:347-407,449-543``): instead of data-dependent
pointer skips (which serialize), every position is evaluated branchlessly at
HBM-bandwidth; exact offsets are recovered on host only for tiles whose count
is nonzero (``ops/scan_np.py``).

Comparison semantics (see ``pattern.py``):

- unsigned (WILDCARD): ``cur - prev == Ty(expected)`` with native wraparound;
- signed (SIMPLE/VALUE_SCAN): exact signed equality, computed without
  widening as ``(cur - prev == Ty(e)) & ((cur >= prev) == (e >= 0))`` —
  full-rate u8/u16 VPU ops.

The kernel is specialized (recompiled) per (dtype, shift-pair tuple,
signed-ness, tile geometry); the expected values travel in SMEM so searching
a different same-shape keyword reuses the executable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pattern import CompiledPattern

__all__ = [
    "pallas_available",
    "tile_counts_pallas",
    "LANES",
    "DEFAULT_TILE_ROWS",
]

LANES = 1024  # elements per row (8 VPU lane groups)
DEFAULT_TILE_ROWS = 64  # 64 KiB per tile for u8


_PALLAS_PROBE: dict = {}


def pallas_available() -> bool:
    """True when the Mosaic toolchain can compile the element-dtype kernel.

    Probed empirically (once per process) by compiling a tiny u8 kernel:
    some TPU toolchains (e.g. the axon remote-compile service for v5e at the
    time of writing) only legalize 32-bit vector arithmetic and abort on
    i8/i16 ops — in that case the scan falls back to the fused XLA path,
    which already sustains ~HBM-roofline on the count phase.
    """
    key = "ok"
    if key in _PALLAS_PROBE:
        return _PALLAS_PROBE[key]
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            _PALLAS_PROBE[key] = False
            return False
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def probe_kernel(x_ref, o_ref):
            a = x_ref[:]
            o_ref[0, 0] = jnp.sum(
                ((a - jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)) == a)
                .astype(jnp.int32)
            )

        x = jnp.zeros((32, 128), dtype=jnp.uint8)
        out = pl.pallas_call(
            probe_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x)
        jax.block_until_ready(out)
        _PALLAS_PROBE[key] = True
    except Exception:
        _PALLAS_PROBE[key] = False
    return _PALLAS_PROBE[key]


@functools.partial(
    jax.jit,
    static_argnames=("pairs", "length", "tile_rows", "interpret"),
)
def _tile_counts_call(
    data2d: jnp.ndarray,
    expected: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    pairs: Tuple[Tuple[int, int], ...],
    length: int,
    tile_rows: int,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = data2d.shape
    assert tile_rows % 32 == 0, "tile_rows must be a multiple of 32 sublanes"
    # last tile = halo/padding, not counted (shared contract with
    # scan_jnp.tile_counts_xla)
    num_tiles = rows // tile_rows - 1

    def kernel(expected_ref, valid_ref, tile_ref, next_ref, out_ref):
        i = pl.program_id(0)
        tile = tile_ref[:]
        # rows shifted down by one (element index + LANES); the halo block is
        # 8 sublanes (Mosaic tiling minimum) of which only row 0 is used
        down = jnp.concatenate([tile[1:], next_ref[0:1]], axis=0)

        def shifted(s):
            if s == 0:
                return tile
            return jnp.concatenate([tile[:, s:], down[:, :s]], axis=1)

        ok = None
        for k, (cs, ps) in enumerate(pairs):
            cur = shifted(cs)
            prev = shifted(ps)
            # expected travels as int32 in SMEM (SMEM prefers 32-bit
            # scalars); cast to the element dtype for the mod-2^width
            # prefilter compare (host extraction applies exact semantics)
            e = expected_ref[k].astype(tile.dtype)
            okk = (cur - prev) == e
            ok = okk if ok is None else jnp.logical_and(ok, okk)
        if ok is None:
            ok = jnp.ones(tile.shape, dtype=jnp.bool_)

        # mask window starts that poke past the valid element count
        base = i * (tile_rows * lanes)
        r = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
        pos = base + r * lanes + c
        ok = jnp.logical_and(ok, pos <= valid_ref[0] - length)

        # whole counts vector lives in SMEM; each (sequential) grid step
        # writes its own slot
        out_ref[i, 0] = jnp.sum(ok.astype(jnp.int32))

    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # expected
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid
            pl.BlockSpec(
                (tile_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                # 32 sublanes: the minimum tile height for int8 (and a
                # multiple of int16's 16); only row 0 is consumed
                (32, lanes),
                lambda i: ((i + 1) * (tile_rows // 32), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 1), jnp.int32),
        interpret=interpret,
    )(expected, valid, data2d, data2d)


def tile_counts_pallas(
    pat: CompiledPattern,
    data2d: jnp.ndarray,
    valid_count: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-tile match counts for a (rows, LANES) element array.

    Contract (shared with ``scan_jnp.tile_counts_xla``): ``rows`` is
    ``(T+1) * tile_rows`` — T counted tiles plus one trailing tile of
    halo/padding, so every counted window reads real array data.  Returns
    int32[T] where tile t covers element positions
    [t*tile_rows*LANES, (t+1)*tile_rows*LANES).
    """
    pairs = tuple(
        (int(c), int(p))
        for c, p in zip(pat.chk_shift_cur, pat.chk_shift_prev)
    )
    rows, lanes = data2d.shape
    num_tiles = rows // tile_rows - 1
    if not pairs:
        # No literal checks (e.g. all-wildcard keyword): every valid window
        # matches; count directly.
        tile_elems = tile_rows * lanes
        starts = np.arange(num_tiles) * tile_elems
        last_valid = valid_count - pat.length  # inclusive
        counts = np.clip(last_valid + 1 - starts, 0, tile_elems)
        return jnp.asarray(counts.astype(np.int32))
    from .scan_jnp import prefilter_expected

    expected = jnp.asarray(prefilter_expected(pat).astype(np.int32))
    valid = jnp.asarray([valid_count], dtype=jnp.int32)
    counts = _tile_counts_call(
        data2d,
        expected,
        valid,
        pairs=pairs,
        length=pat.length,
        tile_rows=tile_rows,
        interpret=interpret,
    )
    return counts[:, 0]
