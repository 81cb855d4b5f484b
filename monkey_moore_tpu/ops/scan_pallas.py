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

Comparison semantics: mod-2^width prefilter (see ``scan_jnp.prefilter_expected``
— may overcount, never undercounts; host extraction applies exact semantics).

Two compute modes, auto-probed per toolchain (``pallas_compute_mode``):

- ``native``: compares in the element dtype (u8/u16) — full-rate narrow VPU
  lanes on toolchains that legalize sub-32-bit vector arithmetic.
- ``i32``: converts each VMEM tile to int32 after load and compares
  ``(cur - prev) & (2^width - 1) == expected`` — every vector op is 32-bit,
  which the axon remote-compile Mosaic service for v5e legalizes even though
  it rejects i8/i16 vector math.  HBM traffic is identical (tiles are read at
  element width); only the in-register compute widens.

The kernel is specialized (recompiled) per (dtype, shift-pair tuple, mode,
tile geometry); the expected values travel in SMEM so searching a different
same-shape keyword reuses the executable.
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
    "pallas_compute_mode",
    "tile_counts_pallas",
    "LANES",
    "DEFAULT_TILE_ROWS",
]

LANES = 1024  # elements per row (8 VPU lane groups)

# the check-selection heuristic's row bound must track LANES (scan_jnp
# cannot import this module without a cycle)
from .scan_jnp import _ROW_ELEMS as _SELECTION_ROW_ELEMS  # noqa: E402

assert _SELECTION_ROW_ELEMS == LANES, (
    "scan_jnp._ROW_ELEMS must equal scan_pallas.LANES"
)
DEFAULT_TILE_ROWS = 256  # 256 KiB per tile for u8 (measured: fewer grid
# steps amortize the ~0.7 µs/step scalar prologue; 256 KiB balances kernel
# rate against host hot-tile extraction granularity)


_PALLAS_PROBE: dict = {}


def _run_probe_kernel(mode: str) -> None:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe_kernel(x_ref, o_ref):
        if mode == "swar":
            # the SWAR op mix: sub/xor/or/and/shifts/mul, all i32 vectors
            x = x_ref[:]
            H, L7, O1 = _i32c(0x80808080), _i32c(0x7F7F7F7F), _i32c(0x01010101)
            y = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
            y = jax.lax.shift_right_logical(x, jnp.int32(8)) | (
                y << jnp.int32(24)
            )
            sub = ((x | H) - (y & L7)) ^ ((x ^ ~y) & H)
            t = (sub & L7) + L7
            z = ~(t | sub | L7)
            ones = jax.lax.shift_right_logical(z, jnp.int32(7)) & O1
            cnt = jax.lax.shift_right_logical(ones * O1, jnp.int32(24))
            o_ref[0, 0] = jnp.sum(cnt)
            return
        a = x_ref[:]
        if mode == "i32":
            a = a.astype(jnp.int32)
        b = jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)
        d = a - b
        if mode == "i32":
            d = d & jnp.int32(0xFF)
        o_ref[0, 0] = jnp.sum((d == a).astype(jnp.int32))

    if mode == "swar":
        inputs = [jnp.zeros((8, 128), dtype=jnp.int32)]
    else:
        # "native" must legalize BOTH element widths the process can scan
        # (a toolchain legalizing i8 but not i16 vector math would
        # otherwise cache mode='native' and crash on 16-bit searches)
        inputs = [
            jnp.zeros((32, 128), dtype=jnp.uint8),
            jnp.zeros((16, 128), dtype=jnp.uint16),
        ]
    for x in inputs:
        out = pl.pallas_call(
            probe_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x)
        jax.block_until_ready(out)


def pallas_compute_mode() -> str | None:
    """Which Pallas compute mode this toolchain legalizes (probed once).

    Returns ``"native"`` (element-dtype vector math), ``"swar"`` (elements
    packed 4-or-2-per-int32-lane, every vector op 32-bit — the fast mode on
    the axon remote-compile Mosaic service for v5e, which rejects i8/i16
    vector arithmetic but legalizes all 32-bit ops), ``"i32"``
    (per-element convert to 32-bit — legal in the same places as swar but
    ~2-3x more vector work), or ``None`` (no Pallas; fall back to the fused
    XLA path).  Override with ``MMTPU_PALLAS_MODE=native|swar|i32|off``.
    """
    if "mode" in _PALLAS_PROBE:
        return _PALLAS_PROBE["mode"]
    import os

    forced = os.environ.get("MMTPU_PALLAS_MODE", "").strip().lower()
    if forced in ("native", "swar", "i32"):
        _PALLAS_PROBE["mode"] = forced
        return forced
    if forced == "off":
        _PALLAS_PROBE["mode"] = None
        return None
    mode = None
    if jax.default_backend() in ("tpu", "axon"):
        for candidate in ("native", "swar", "i32"):
            try:
                _run_probe_kernel(candidate)
                mode = candidate
                break
            except Exception:
                continue
    _PALLAS_PROBE["mode"] = mode
    return mode


def pallas_available() -> bool:
    """True when some Pallas compute mode compiles on this toolchain."""
    return pallas_compute_mode() is not None


def _run_probe_gather() -> None:
    """Compile-probe the scalar-prefetch tile gather (tiny shapes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ids_ref, in_ref, out_ref):
        out_ref[:] = in_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, 2),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, j, ids: (ids[i] + j, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j, ids: (i * 2 + j, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
    )(
        jnp.zeros(2, dtype=jnp.int32),
        jnp.zeros((24, 128), dtype=jnp.int32),
    )
    jax.block_until_ready(out)


def _run_probe_gather_dma() -> None:
    """Compile-probe the manual-DMA hot-tile gather (tiny shapes)."""
    out = _gather_tiles_dma_call(
        jnp.zeros((24, 128), dtype=jnp.int32),
        jnp.zeros(2, dtype=jnp.int32),
        k_cap=2,
        rows_per_tile=8,
        interpret=False,
    )
    jax.block_until_ready(out)


def pallas_gather_mode() -> str | None:
    """Which hot-tile gather lowers on this toolchain (probed once).

    ``"dma"`` — the manual-DMA kernel (:func:`_gather_tiles_dma_call`): one
    contiguous tile+halo HBM→HBM copy per slot with a rolling window of
    outstanding DMAs, so a large ``k_cap`` costs overlapped bandwidth, not
    serialized per-block latency.  ``"block"`` — the scalar-prefetch
    BlockSpec kernel (:func:`_gather_tiles_call`): 2 pipelined (rows, lanes)
    blocks per slot.  ``None`` — XLA row-index take.  Override with
    ``MMTPU_PALLAS_GATHER=dma|block|0``.
    """
    if "gather_mode" in _PALLAS_PROBE:
        return _PALLAS_PROBE["gather_mode"]
    import os

    forced = os.environ.get("MMTPU_PALLAS_GATHER", "").strip().lower()
    if forced == "0":
        _PALLAS_PROBE["gather_mode"] = None
        return None
    mode = None
    if jax.default_backend() in ("tpu", "axon"):
        candidates = (
            [forced] if forced in ("dma", "block") else ["dma", "block"]
        )
        for candidate in candidates:
            try:
                if candidate == "dma":
                    _run_probe_gather_dma()
                else:
                    _run_probe_gather()
                mode = candidate
                break
            except Exception:
                continue
    _PALLAS_PROBE["gather_mode"] = mode
    return mode


def pallas_gather_available() -> bool:
    """True when some Pallas hot-tile gather lowers on this toolchain
    (probed once; ``MMTPU_PALLAS_GATHER=0`` forces the XLA row-gather
    fallback)."""
    return pallas_gather_mode() is not None


@functools.partial(
    jax.jit, static_argnames=("k_cap", "rows_per_tile", "interpret")
)
def _gather_tiles_dma_call(
    data2d: jnp.ndarray,
    hot: jnp.ndarray,
    *,
    k_cap: int,
    rows_per_tile: int,
    interpret: bool,
):
    """Manual-DMA hot-tile gather: ONE contiguous (tile + successor-halo)
    HBM→HBM copy per slot, with a rolling window of ``W`` outstanding DMAs.

    The BlockSpec formulation (:func:`_gather_tiles_call`) moves the same
    bytes as 2 pipelined small blocks per slot, which is per-block
    *latency*-bound at fine tile sizes — a 512-slot gather of 8 KiB tiles
    issues 1024 serialized ~8 KiB copies.  Here slot ``i`` is a single
    ``2 * rows_per_tile``-row copy (tile ``hot[i]`` plus its halo tile,
    contiguous rows) and up to ``W`` copies are in flight, so a large
    ``k_cap`` costs overlapped HBM bandwidth rather than serialized
    round trips.  Same output contract as :func:`_gather_tiles_call`:
    ``(k_cap * 2 * rows_per_tile, lanes)``, slot i at rows
    ``[i * 2 * rows_per_tile, (i + 1) * 2 * rows_per_tile)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = data2d.shape
    span = 2 * rows_per_tile
    W = min(8, k_cap)  # outstanding copies

    def kernel(ids_ref, in_ref, out_ref, sems):
        def dma(slot):
            r0 = ids_ref[slot] * rows_per_tile
            return pltpu.make_async_copy(
                in_ref.at[pl.ds(r0, span)],
                out_ref.at[pl.ds(slot * span, span)],
                sems.at[slot % W],
            )

        for j in range(W):
            dma(j).start()

        def body(j, carry):
            dma(j).wait()

            @pl.when(j + W < k_cap)
            def _():
                dma(j + W).start()

            return carry

        jax.lax.fori_loop(0, k_cap, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_cap * span, lanes), data2d.dtype),
        interpret=interpret,
    )(hot, data2d)


@functools.partial(
    jax.jit, static_argnames=("k_cap", "rows_per_tile", "interpret")
)
def _gather_tiles_call(
    data2d: jnp.ndarray,
    hot: jnp.ndarray,
    *,
    k_cap: int,
    rows_per_tile: int,
    interpret: bool,
):
    """Gather ``k_cap`` hot fine tiles (plus each tile's successor, which
    holds its halo) out of the corpus with data-dependent DMA.

    The BlockSpec index map reads the hot-tile ids from a scalar-prefetch
    operand, so each grid step DMAs one (rows_per_tile, lanes) block from
    HBM — **O(k_cap) temporary memory**.  This replaces a
    ``data2d.reshape(-1, tile_w)`` + take formulation whose retiling
    materialized a second corpus-sized buffer (compile-time HBM OOM at
    8 GiB on a 16 GiB chip).

    ``hot`` ids are in fine-tile units; ``data2d`` must hold at least
    ``max(hot) + 2`` tiles of ``rows_per_tile`` rows (guaranteed by the
    counts contract: T counted tiles + one trailing halo tile).  Returns
    ``(k_cap * 2 * rows_per_tile, lanes)`` with slot i's span at rows
    ``[i * 2 * rows_per_tile, (i + 1) * 2 * rows_per_tile)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = data2d.shape

    def kernel(ids_ref, in_ref, out_ref):
        out_ref[:] = in_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k_cap, 2),
        in_specs=[
            pl.BlockSpec(
                (rows_per_tile, lanes), lambda i, j, ids: (ids[i] + j, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows_per_tile, lanes), lambda i, j, ids: (i * 2 + j, 0)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (k_cap * 2 * rows_per_tile, lanes), data2d.dtype
        ),
        interpret=interpret,
    )(hot, data2d)


@functools.partial(
    jax.jit,
    static_argnames=("pairs", "length", "tile_rows", "widen", "interpret"),
)
def _tile_counts_call(
    data2d: jnp.ndarray,
    expected: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    pairs: Tuple[Tuple[int, int], ...],
    length: int,
    tile_rows: int,
    widen: bool,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = data2d.shape
    assert tile_rows % 32 == 0, "tile_rows must be a multiple of 32 sublanes"
    # last tile = halo/padding, not counted (shared contract with
    # scan_jnp.tile_counts_xla)
    num_tiles = rows // tile_rows - 1
    elem_mask = int(np.iinfo(np.dtype(data2d.dtype)).max)

    def kernel(expected_ref, valid_ref, tile_ref, next_ref, out_ref):
        i = pl.program_id(0)
        tile = tile_ref[:]
        halo = next_ref[0:1]
        if widen:
            # all vector math in 32-bit (sub-32-bit arithmetic does not
            # legalize on this toolchain); HBM/VMEM traffic stays at
            # element width — only the in-register compute widens
            tile = tile.astype(jnp.int32)
            halo = halo.astype(jnp.int32)
        # rows shifted down by one (element index + LANES); the halo block is
        # 8 sublanes (Mosaic tiling minimum) of which only row 0 is used
        down = jnp.concatenate([tile[1:], halo], axis=0)

        def shifted(s):
            if s == 0:
                return tile
            return jnp.concatenate([tile[:, s:], down[:, :s]], axis=1)

        ok = None
        for k, (cs, ps) in enumerate(pairs):
            cur = shifted(cs)
            prev = shifted(ps)
            # expected travels as int32 in SMEM (SMEM prefers 32-bit
            # scalars); compare mod 2^width in either mode (prefilter —
            # host extraction applies exact semantics)
            if widen:
                okk = ((cur - prev) & jnp.int32(elem_mask)) == expected_ref[k]
            else:
                e = expected_ref[k].astype(tile.dtype)
                okk = (cur - prev) == e
            ok = okk if ok is None else jnp.logical_and(ok, okk)
        if ok is None:
            ok = jnp.ones(tile.shape, dtype=jnp.bool_)

        # mask window starts that poke past the valid element count.
        # positions are tile-relative against a per-tile scalar threshold
        # (valid = vt * tile_elems + vr, split on host) so corpora larger
        # than 2^31 elements never overflow the int32 lanes
        r = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
        local_pos = r * lanes + c
        vt, vr = valid_ref[0], valid_ref[1]
        thr = jnp.where(
            i < vt, jnp.int32(tile_rows * lanes), jnp.where(i == vt, vr, -1)
        )
        ok = jnp.logical_and(ok, local_pos <= thr)

        # one (8, 128) VMEM output block per grid step, count broadcast over
        # the block (a whole-counts SMEM vector exceeds the 1 MiB SMEM budget
        # past ~2k tiles, and sub-(8,128) VMEM blocks don't lower); the host
        # reads element [8*t, 0] per tile — 4 KiB per 64 KiB tile scanned
        cnt = jnp.sum(ok.astype(jnp.int32))
        out_ref[:] = jnp.broadcast_to(cnt, (8, 128))

    raw = pl.pallas_call(
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
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_tiles * 8, 128), jnp.int32),
        interpret=interpret,
    )(expected, valid, data2d, data2d)
    # compact inside the jit so only int32[T] crosses the device boundary
    return raw[::8, 0]


def _i32c(value: int) -> jnp.ndarray:
    """int32 constant from a u32 bit pattern (e.g. 0x80808080)."""
    return jnp.int32(np.int32(np.uint32(value & 0xFFFFFFFF)))


@functools.partial(jax.jit, static_argnames=("width",))
def _pack_words(data2d: jnp.ndarray, *, width: int):
    """On-device fallback packing of an element array into little-endian i32
    words (one relayout pass; prefer uploading ``swar_host_view`` instead)."""
    rows, lanes = data2d.shape
    k = 4 // width
    u = data2d.astype(jnp.uint32)
    parts = u.reshape(rows, lanes // k, k)
    word = parts[..., 0]
    for j in range(1, k):
        word = word | (parts[..., j] << jnp.uint32(8 * width * j))
    return word.astype(jnp.int32)


def swar_host_view(arr: np.ndarray) -> np.ndarray:
    """Free reinterpretation of a host element buffer as packed little-endian
    int32 words (the SWAR kernel's operand layout).  Upload THIS to keep the
    device buffer bitcast-free."""
    assert arr.dtype.itemsize in (1, 2)
    assert arr.nbytes % 4 == 0
    return arr.reshape(-1).view("<i4")


def _swar_constants(width: int):
    """(H, LOW, ONES) SWAR bit masks for the element width."""
    if width == 1:
        return 0x80808080, 0x7F7F7F7F, 0x01010101
    return 0x80008000, 0x7FFF7FFF, 0x00010001


def _swar_helpers(width: int, lanes32: int):
    """Shared building blocks of the single- and multi-pattern SWAR count
    kernels (they MUST stay bit-identical across both):

    - ``ext_views(tile, nxt)`` — the full-height extended array and its
      one-row-down view.  Load-bearing invariant: ext_down's final
      duplicated row is junk, consumed only by window starts past
      ``tile_rows + halo`` that the valid masking excludes.
    - ``swar_sub(x, y)`` — carry-free elementwise subtraction mod 2^ebits
      (Hacker's Delight); borrow never crosses the element boundary.
    - ``make_shift(A, A_down)`` — element-shift views with lane concats
      cached per whole-word offset.
    - ``popcount(zz)`` — per-word population count of zero-detected
      elements.
    - ``boundary_mask(shape, vr)`` — per-element keep mask for the tile
      holding the last valid window start.

    Returns a zero-arg ``build()`` that MUST be called INSIDE the pallas
    kernel body (the i32 splat constants are traced values; constructing
    them outside the kernel would be a captured-constant error) and yields
    ``(hH, hLOW, hONES, ext_views, swar_sub, make_shift, popcount,
    boundary_mask)``.
    """
    ebits = 8 * width
    k_per_word = 4 // width
    H, LOW, ONES = _swar_constants(width)

    def build():
        hH, hLOW, hONES = _i32c(H), _i32c(LOW), _i32c(ONES)

        def ext_views(tile, nxt):
            ext = jnp.concatenate([tile, nxt], axis=0)
            ext_down = jnp.concatenate([tile[1:], nxt, nxt[7:8]], axis=0)
            return ext, ext_down

        def swar_sub(x, y):
            return ((x | hH) - (y & hLOW)) ^ ((x ^ ~y) & hH)

        def make_shift(A, A_down):
            cache = {}

            def lane(q):
                if q == 0:
                    return A
                if q == lanes32:
                    return A_down
                if q not in cache:
                    cache[q] = jnp.concatenate(
                        [A[:, q:], A_down[:, :q]], axis=1
                    )
                return cache[q]

            def elem(s):
                # view shifted by s elements = s*width bytes; crossing
                # word boundaries: little-endian, so byte p+1 is the
                # next-higher byte — logical right shift + next word's
                # low bytes
                q, r = divmod(s * width, 4)
                lo = lane(q)
                if r == 0:
                    return lo
                return jax.lax.shift_right_logical(
                    lo, jnp.int32(8 * r)
                ) | (lane(q + 1) << jnp.int32(32 - 8 * r))

            return elem

        def popcount(zz):
            # each matching element contributes 1 at its low bit after
            # the shift; multiply-accumulate sums element lanes into the
            # top one
            ones = jax.lax.shift_right_logical(
                zz, jnp.int32(ebits - 1)
            ) & hONES
            return jax.lax.shift_right_logical(
                ones * hONES, jnp.int32(32 - ebits)
            )

        def boundary_mask(shape, vr):
            r_ = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            c_ = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            pos0 = (r_ * lanes32 + c_) * k_per_word
            top = 0x80 if width == 1 else 0x8000
            vm = None
            for j in range(k_per_word):
                bit = _i32c(top << (ebits * j))
                keep = jnp.where(pos0 + j <= vr, bit, 0)
                vm = keep if vm is None else vm | keep
            return vm

        return (hH, hLOW, hONES, ext_views, swar_sub, make_shift,
                popcount, boundary_mask)

    return build


@functools.partial(
    jax.jit,
    static_argnames=(
        "pairs", "length", "tile_rows", "width", "interpret",
        "fine_per_block", "wc_run",
    ),
)
def _tile_counts_swar_call(
    packed2d: jnp.ndarray,
    expected: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    pairs: Tuple[Tuple[int, int], ...],
    length: int,
    tile_rows: int,
    width: int,
    interpret: bool,
    fine_per_block: int = 1,
    wc_run: Tuple[int, int] | None = None,
):
    """SWAR tile-count kernel: elements packed 4-(u8) or 2-(u16) per int32
    lane, every vector op 32-bit (legal on Mosaic toolchains that reject
    sub-32-bit vector math, unlike the ``native`` kernel) while each op still
    processes 4 bytes per lane (unlike the 4x-widened ``i32`` kernel).

    ``packed2d``: (rows, lanes32) int32, little-endian bytes — element p of
    the flat corpus lives in word ``p*W//4`` at byte offset ``p*W%4``
    (``swar_host_view``).  Same row/tile geometry as the element-dtype kernel:
    one row = ``4*lanes32`` bytes; counts per ``tile_rows`` rows.

    Hot-loop structure (compute-bound; every op trimmed):

    - **Diff reuse**: checks are grouped by bridge distance ``d = cs - ps``;
      the carry-free SWAR subtraction (7 vector ops) runs ONCE per distinct
      distance to produce ``D_d[e] = data[e+d] - data[e]``, and each check
      then costs only an element shift of the cached diff array + xor with
      the expected value + or into the accumulator.  For plain keywords
      (every bridge distance 1) this replaces L-1 subtractions with one.
    - **Pre-splatted expected**: ``expected`` arrives from SMEM already
      splatted across the i32 word (``e * 0x01010101``), so the per-check
      compare is a single scalar-broadcast xor — no per-word multiply.
    - **Boundary-only validity masking**: every window start inside a fully
      valid tile is counted unmasked; the one tile containing
      ``valid - length`` runs the exact per-element mask under ``pl.when``
      and tiles past it write 0.  Steady-state tiles pay zero masking cost
      while counts stay exactly equal to the prefilter semantics.

    A window matches iff its accumulator element is 0, detected once at the
    end with the carry-free zero-element trick, then population-counted.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes32 = packed2d.shape
    assert tile_rows % 8 == 0, "tile_rows must be a multiple of 8 sublanes"
    if fine_per_block == 1:
        num_tiles = rows // tile_rows - 1
    else:
        # grouped dispatch: the trailing halo is one FINE tile (>= 8 rows,
        # all the 8-row next_ref block needs), not a whole dispatch block
        fine_rows = tile_rows // fine_per_block
        assert fine_rows % 8 == 0 and tile_rows % fine_per_block == 0
        num_tiles = (rows - fine_rows) // tile_rows
    k_per_word = 4 // width  # elements per i32 word
    ebits = 8 * width

    # group checks by bridge distance so the SWAR subtraction runs once per
    # distinct distance (see docstring); plain keywords have one group
    groups: dict = {}
    for k, (cs, ps) in enumerate(pairs):
        groups.setdefault(cs - ps, []).append((k, ps))

    swar_build = _swar_helpers(width, lanes32)

    def kernel(expected_ref, valid_ref, tile_ref, next_ref, out_ref):
        i = pl.program_id(0)
        tile = tile_ref[:]
        nxt = next_ref[:]  # (8, lanes32) halo rows past the tile
        (hH, hLOW, hONES, ext_views, swar_sub, make_shift, popcount,
         boundary_mask) = swar_build()

        # Full-height extended arrays: Mosaic rejects lane-dim concats of
        # 1-row slices with offset layouts ("result/input offset mismatch on
        # non-concat dimension"), so every lane concat below keeps the full
        # sublane extent — compute runs on tile_rows+8 rows and the halo
        # rows are sliced off the accumulator before counting.  The extra
        # 8 rows cost <1% FLOPs at tile_rows >= 1024.
        ext, ext_down = ext_views(tile, nxt)
        ext_shift = make_shift(ext, ext_down)

        def write_cnt(cnt):
            """Assemble per-word i32 match counts into the output block."""
            if fine_per_block == 1:
                out_ref[:] = jnp.broadcast_to(jnp.sum(cnt), (8, 128))
                return
            # Per-fine-tile sub-counts assembled into the (8, 128) output
            # block (row-major slot f = fine tile f of this block): the
            # dispatch block stays large for kernel rate while hot-tile
            # extraction stays fine-grained — same output traffic either
            # way.  Assembly via iota/select keeps every op a plain 2-D
            # i32 vector op (Mosaic restricts small reshapes).
            rows_per_fine = tile_rows // fine_per_block
            rr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            slot = rr * 128 + cc
            out = jnp.zeros((8, 128), jnp.int32)
            for f in range(fine_per_block):
                s = jnp.sum(
                    cnt[f * rows_per_fine : (f + 1) * rows_per_fine]
                )
                out = out + jnp.where(slot == f, s, 0)
            out_ref[:] = out

        # validity masking runs ONLY in the tile holding the last valid
        # window start (valid split into tile index vt + remainder vr on
        # host — int32-safe past 2^31 elements); earlier tiles count
        # unmasked, later tiles are all-invalid and write 0
        vt, vr = valid_ref[0], valid_ref[1]
        run = wc_run  # static: part of the jit cache key (see caller)
        if run is not None:
            # Word-compare formulation (see :func:`wordcmp_run`): the C
            # checks are a consecutive distance-1 run, so for word parity
            # k the whole condition is ONE 32-bit equality of the
            # (m+k)-element-shifted diff view against the packed expected
            # word — no xor/or accumulator, no zero-detect, no popcount.
            m, C = run
            D = swar_sub(ext_shift(1), ext)
            if any(m + k for k in range(k_per_word)):
                D_shift = make_shift(
                    D, jnp.concatenate([D[1:], D[-1:]], axis=0)
                )
            P = expected_ref[0]  # packed on host (swar_dispatch_args)
            bools = []
            for k in range(k_per_word):
                s = m + k
                v = D if s == 0 else D_shift(s)
                if C == k_per_word:
                    b = v == P
                else:
                    # short runs compare only the C covered elements
                    mask = (1 << (ebits * C)) - 1
                    b = ((v ^ P) & _i32c(mask)) == 0
                bools.append(b[:tile_rows])

            def counts_words(keeps=None):
                cnt = None
                for k, b in enumerate(bools):
                    bk = b if keeps is None else b & keeps[k]
                    ck = jnp.where(bk, 1, 0)
                    cnt = ck if cnt is None else cnt + ck
                return cnt

            write_cnt(counts_words())

            @pl.when(i == vt)
            def _boundary_wc():
                r_ = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
                c_ = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
                pos0 = (r_ * lanes32 + c_) * k_per_word
                keeps = [pos0 + k <= vr for k in range(k_per_word)]
                write_cnt(counts_words(keeps))

            @pl.when(i > vt)
            def _past_wc():
                out_ref[:] = jnp.zeros((8, 128), jnp.int32)

            return

        acc = None
        for d, checks in groups.items():
            # diff array for this bridge distance over the extended block:
            # D[e] = data[e+d] - data[e], valid through the halo rows the
            # check shifts below reach (each shift spans <= 1 row)
            D = swar_sub(ext_shift(d), ext)
            if any(ps for _, ps in checks):
                D_shift = make_shift(
                    D, jnp.concatenate([D[1:], D[-1:]], axis=0)
                )
            for k, ps in checks:
                # v[e] = data[e+cs] - data[e+ps] with cs = ps + d
                v = D if ps == 0 else D_shift(ps)
                diff = v ^ expected_ref[k]  # expected pre-splatted on host
                acc = diff if acc is None else acc | diff
        if acc is None:
            acc = jnp.zeros(ext.shape, dtype=jnp.int32)
        acc = acc[:tile_rows]

        # zero-element detect: top bit of each element set iff element == 0
        t = (acc & hLOW) + hLOW
        z = ~(t | acc | hLOW)

        write_cnt(popcount(z))

        @pl.when(i == vt)
        def _boundary():
            write_cnt(popcount(z & boundary_mask(tile.shape, vr)))

        @pl.when(i > vt)
        def _past():
            out_ref[:] = jnp.zeros((8, 128), jnp.int32)

    raw = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # expected
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid
            pl.BlockSpec(
                (tile_rows, lanes32), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, lanes32),
                lambda i: ((i + 1) * (tile_rows // 8), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_tiles * 8, 128), jnp.int32),
        interpret=interpret,
    )(expected, valid, packed2d, packed2d)
    if fine_per_block == 1:
        return raw[::8, 0]
    # per-block (8, 128) slots, row-major: fine tile counts
    return raw.reshape(num_tiles, 8 * 128)[:, :fine_per_block].reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pair_sets", "tile_rows", "width", "interpret", "fine_per_block",
    ),
)
def _tile_counts_swar_multi_call(
    packed2d: jnp.ndarray,
    expected: jnp.ndarray,
    active: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    pair_sets: Tuple[Tuple[Tuple[int, int], ...], ...],
    tile_rows: int,
    width: int,
    interpret: bool,
    fine_per_block: int = 1,
):
    """SWAR tile-count kernel for MANY patterns in ONE pass over HBM.

    The multi-keyword twin of :func:`_tile_counts_swar_call`: the corpus
    tile is loaded into VMEM once and every pattern's checks are evaluated
    against it — HBM traffic is 1x regardless of the batch size, and the
    carry-free SWAR diff arrays are shared across patterns whose checks
    use the same bridge distance (a batch of plain keywords costs ONE
    subtraction total plus per-pattern xors).  This is the device core of
    ``multi.MultiSearcher``; the reference re-reads and re-scans the whole
    file per keyword (``src/core/search_engine.cpp:120-127``).

    ``expected``: (K, C_max) int32, pre-splatted per word; ``active``:
    (K, C_max) int32 full-word masks (-1 live, 0 padding) so canonically
    padded batches share one executable; ``valid``: (K, 2) per-pattern
    [boundary-block, remainder] encodings (patterns may differ in length).
    Returns a tuple of K int32[T] count arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes32 = packed2d.shape
    assert tile_rows % 8 == 0
    K = len(pair_sets)
    if fine_per_block == 1:
        num_tiles = rows // tile_rows - 1
    else:
        fine_rows = tile_rows // fine_per_block
        assert fine_rows % 8 == 0 and tile_rows % fine_per_block == 0
        num_tiles = (rows - fine_rows) // tile_rows
    k_per_word = 4 // width
    ebits = 8 * width
    swar_build = _swar_helpers(width, lanes32)

    def kernel(expected_ref, active_ref, valid_ref, tile_ref, next_ref,
               *out_refs):
        i = pl.program_id(0)
        tile = tile_ref[:]
        nxt = next_ref[:]
        (hH, hLOW, hONES, ext_views, swar_sub, make_shift, popcount,
         boundary_mask) = swar_build()

        # shared building blocks with the single-pattern kernel — see
        # _swar_helpers for the load-bearing ext_down junk-row invariant
        ext, ext_down = ext_views(tile, nxt)
        ext_shift = make_shift(ext, ext_down)

        # diff arrays + their shift closures, shared ACROSS patterns by
        # bridge distance
        dcache: dict = {}
        scache: dict = {}

        def get_D(d):
            if d not in dcache:
                dcache[d] = swar_sub(ext_shift(d), ext)
            return dcache[d]

        def get_shift(d):
            if d not in scache:
                D = get_D(d)
                scache[d] = make_shift(
                    D, jnp.concatenate([D[1:], D[-1:]], axis=0)
                )
            return scache[d]

        rows_per_fine = tile_rows // fine_per_block
        rr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slot = rr * 128 + cc

        for k, pairs in enumerate(pair_sets):
            acc = None
            for c, (cs, ps) in enumerate(pairs):
                D = get_D(cs - ps)
                v = D if ps == 0 else get_shift(cs - ps)(ps)
                # padding checks carry active mask 0 → contribute nothing
                diff = (v ^ expected_ref[k, c]) & active_ref[k, c]
                acc = diff if acc is None else acc | diff
            if acc is None:
                acc = jnp.zeros(ext.shape, dtype=jnp.int32)
            acc = acc[:tile_rows]
            t = (acc & hLOW) + hLOW
            z = ~(t | acc | hLOW)

            def write(zz, out_ref=out_refs[k]):
                cnt = popcount(zz)
                if fine_per_block == 1:
                    out_ref[:] = jnp.broadcast_to(jnp.sum(cnt), (8, 128))
                    return
                out = jnp.zeros((8, 128), jnp.int32)
                for f in range(fine_per_block):
                    s = jnp.sum(
                        cnt[f * rows_per_fine : (f + 1) * rows_per_fine]
                    )
                    out = out + jnp.where(slot == f, s, 0)
                out_ref[:] = out

            vt, vr = valid_ref[k, 0], valid_ref[k, 1]
            write(z)

            @pl.when(i == vt)
            def _boundary(z=z, vr=vr, write=write):
                write(z & boundary_mask(tile.shape, vr))

            @pl.when(i > vt)
            def _past(out_ref=out_refs[k]):
                out_ref[:] = jnp.zeros((8, 128), jnp.int32)

    out_sds = jax.ShapeDtypeStruct((num_tiles * 8, 128), jnp.int32)
    raws = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # expected (K, C)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # active (K, C)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid (K, 2)
            pl.BlockSpec(
                (tile_rows, lanes32), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, lanes32),
                lambda i: ((i + 1) * (tile_rows // 8), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0)) for _ in range(K)
        ],
        out_shape=[out_sds] * K,
        interpret=interpret,
    )(expected, active, valid, packed2d, packed2d)
    if fine_per_block == 1:
        return tuple(raw[::8, 0] for raw in raws)
    return tuple(
        raw.reshape(num_tiles, 8 * 128)[:, :fine_per_block].reshape(-1)
        for raw in raws
    )


def dispatch_group_cap(
    tile_rows: int, width: int, n_patterns: int = 1
) -> int:
    """Largest ``fine_per_block`` the grouped dispatch can use for this
    fine-tile height — expressed through :func:`dispatch_grouping` (the
    single source of truth for the block bounds) by asking it to group a
    fully divisible tile count."""
    return dispatch_grouping(1 << 30, tile_rows, width, n_patterns)[1]


def dispatch_grouping(
    num_fine_tiles: int, tile_rows: int, width: int, n_patterns: int = 1
) -> Tuple[int, int]:
    """The power-of-two dispatch-block grouping: ``(block_rows,
    fine_per_block)`` with ``block_rows = tile_rows * fine_per_block``,
    grown while the fine-tile count stays divisible, capped at 1024 fine
    tiles and the 2 MiB VMEM dispatch-block budget.

    ``n_patterns``: the MULTI kernel materializes per-pattern count
    blocks + accumulators in scoped VMEM on top of the shared diff
    arrays, so its block budget scales down with the batch size (K=3 at
    the single-pattern grouping needed 21.45 MiB of the 16 MiB scoped
    limit — Mosaic refuses the lowering).

    THE single source of truth — the kernel's boundary masking derives its
    vt/vr encoding from ``block_rows`` (``swar_dispatch_args``), so every
    site that lowers the kernel must use this exact grouping."""
    block_rows, fine_per_block = tile_rows, 1
    max_block_rows = (2 * 1024 * 1024) // max(1, n_patterns) // (
        LANES * width
    )
    while (
        fine_per_block * 2 <= 1024
        and block_rows * 2 <= max_block_rows
        and num_fine_tiles % (fine_per_block * 2) == 0
    ):
        fine_per_block *= 2
        block_rows *= 2
    return block_rows, fine_per_block


def alloc_fine_tiles(n_elems: int, tile_elems: int, width: int = 1) -> int:
    """Fine-tile count an ALLOCATION should provide for ``n_elems``
    elements: ceil(n/tile_elems) counted tiles rounded up to the dispatch
    group (so ``swar_dispatch_args``'s power-of-two block grouping always
    engages — an indivisible tile count silently degrades to one fine tile
    per grid step, ~5x slower at 8-row tiles), NOT including the +1
    halo/padding tile callers must add.  Extra rounded-up tiles scan
    allocated zeros and are masked by the valid limit."""
    t = -(-n_elems // tile_elems)
    group = dispatch_group_cap(tile_elems // LANES, width)
    return -(-t // group) * group


def wordcmp_run(pairs, k_per_word: int):
    """Word-compare kernel eligibility: ``(m, C)`` when the selected checks
    form ONE consecutive distance-1 run (``ps = m, m+1, ..., m+C-1``) with
    ``C <=`` elements-per-word, else ``None``.

    Eligible check sets pack into whole i32 words of the shared diff array
    ``D[e] = data[e+1] - data[e]``: window start ``e`` matches iff bytes
    ``D[e+m .. e+m+C-1]`` equal the expected diffs — for the word parity
    ``k = e mod k_per_word`` that is ONE native 32-bit equality of the
    ``m+k``-element-shifted view of D against the packed expected word.
    This replaces the per-check xor/or accumulation AND the SWAR
    zero-element-detect + popcount tail of the v2 kernel with one compare
    per parity (``MMTPU_WORDCMP=0`` forces v2 for A/B measurement).

    Plain keywords, value scans and custom-sequence searches all compile to
    dense adjacent checks (the reference's simple mode,
    ``src/core/monkey_moore.cpp:106-142``), so this is the production path
    for non-wildcard searches; wildcard bridge tables (``:222-231``) have
    distance > 1 checks and stay on v2.
    """
    import os

    if os.environ.get("MMTPU_WORDCMP", "").strip() == "0":
        return None
    if not pairs or len(pairs) > k_per_word:
        return None
    if any(c != p + 1 for c, p in pairs):
        return None
    ps = [p for _, p in pairs]
    if any(b != a + 1 for a, b in zip(ps, ps[1:])):
        return None
    return ps[0], len(ps)


def swar_dispatch_args(
    pat: CompiledPattern,
    num_fine_tiles: int,
    valid_count: int,
    tile_rows: int,
):
    """Grouped-dispatch geometry + device operands for the SWAR kernel call.

    Shared by :func:`tile_counts_pallas` and the fused one-dispatch scan in
    ``dense.py``.  Returns ``(expected_splat, valid, static)`` where
    ``static`` holds the keyword arguments of ``_tile_counts_swar_call``
    (``pairs``/``length``/``tile_rows``/``width``/``fine_per_block``).

    Dispatch-block auto-grouping: process 2^k fine (count) tiles per grid
    step, emitting 2^k sub-counts in the one (8, 128) output block — large
    VMEM blocks for kernel rate (measured: 256-row blocks 100 GB/s →
    2048-row 117 GB/s end-to-end at 4 GiB) while hot-tile extraction
    granularity stays ``tile_rows``.  2048 rows (2 MiB) is the largest block
    fitting the 16 MiB scoped-VMEM budget with the kernel's shifted/diff
    intermediates.
    """
    from .scan_jnp import pattern_operand_cache, prefilter_checks

    width = np.dtype(pat.dtype).itemsize
    pairs, exp_sel = prefilter_checks(pat)
    wc_run = wordcmp_run(pairs, 4 // width)
    cache = pattern_operand_cache(pat)
    # the formulation (word-compare vs splat) is part of the key so the
    # MMTPU_WORDCMP A/B switch invalidates memoized operands
    memo_key = (
        "dispatch", num_fine_tiles, valid_count, tile_rows, wc_run is None
    )
    if memo_key in cache:
        return cache[memo_key]

    block_rows, fine_per_block = dispatch_grouping(
        num_fine_tiles, tile_rows, width
    )
    want_group = dispatch_group_cap(tile_rows, width)
    if fine_per_block < want_group and num_fine_tiles > 4 * want_group:
        from ..utils.logging import log

        log(
            f"dispatch grouping degraded: {num_fine_tiles} fine tiles not "
            f"divisible by {want_group} (got {fine_per_block}); pad "
            f"allocations with scan_pallas.alloc_fine_tiles for full rate"
        )
    block_elems = block_rows * LANES
    lim = valid_count - pat.length
    # int32-overflow-safe valid-limit encoding: the index of the BLOCK
    # holding the last valid window start, plus the block-relative remainder
    valid = jnp.asarray(
        [lim // block_elems, lim % block_elems], dtype=jnp.int32
    )
    ebits = 8 * width
    if wc_run is not None:
        # word-compare path: ONE packed expected word (diff bytes at their
        # in-word positions, little-endian) — the kernel compares whole i32
        # words of the shared diff array against it
        word = 0
        for j, e in enumerate(exp_sel.astype(np.uint64)):
            word |= (int(e) & ((1 << ebits) - 1)) << (ebits * j)
        expected_splat = jnp.asarray(
            np.asarray([word], dtype=np.uint64)
            .astype(np.uint32)
            .view(np.int32)
        )
    else:
        # expected values pre-splatted across the i32 word on host, so the
        # kernel's per-check compare is a single scalar-broadcast xor
        ones_pat = 0x01010101 if width == 1 else 0x00010001
        exp_ty = exp_sel.astype(np.uint64)
        splat = (exp_ty * ones_pat) & 0xFFFFFFFF
        expected_splat = jnp.asarray(splat.astype(np.uint32).view(np.int32))
    static = dict(
        pairs=pairs,
        length=pat.length,
        tile_rows=block_rows,
        width=width,
        fine_per_block=fine_per_block,
        wc_run=wc_run,
    )
    cache[memo_key] = (expected_splat, valid, static)
    return cache[memo_key]


def _hot_slots_and_combo(
    data2d, counts, exact_args, *, k_cap, rows_per_tile,
    span_elems, tile_elems, length, signed_compare, p_cap, width, packed,
    gather_kernel, interpret,
):
    """Device-side tail of the fused step: gather the first ``k_cap`` hot
    tiles' rows, run EXACT phase 2 on them (``scan_jnp.exact_phase2`` — the
    full check tables, so prefilter false positives never reach the host),
    and pack everything the host needs into ONE flat int32 buffer:

        ``[n_hot, total, n_cand, hot_ids[k], hot_counts[k],
           flat_idx[p], v0[p], v1[p]]``

    One buffer because every device→host transaction on the relay pays
    ~20-30 ms of latency regardless of size, and bulk D2H runs at
    ~25-45 MB/s — fetching hot-tile rows (or the full counts array) costs
    more than the scan itself; candidates + recovery values are O(matches).

    The gather itself is **layout-preserving and O(k_cap) memory**:
    ``gather_kernel`` selects the manual-DMA kernel
    (:func:`_gather_tiles_dma_call`, ``"dma"`` — one overlapped tile+halo
    copy per slot, the production mode), the scalar-prefetch BlockSpec
    kernel (:func:`_gather_tiles_call`, ``"block"``/True), or an XLA
    row-index take (falsy).  (An earlier ``reshape(-1, tile_w)``
    formulation retiled the whole corpus — (rows, lanes) →
    (rows/8, 8*lanes) changes the TPU tiled layout — and XLA reserved a
    corpus-sized temp: compile-time HBM OOM at 8 GiB.)
    Row-index arithmetic keeps indices within int32 even for
    >2^31-element corpora (an 8 GiB u8 corpus has 2^33 elements but 2^23
    rows).  ``total`` is an int32 stats field (may wrap past 2^31
    prefilter hits; extraction never uses it).
    """
    from .scan_jnp import exact_phase2, nonzero_capped

    vtvr, expected_exact, recovery, pairs_exact = exact_args
    hot = nonzero_capped(counts, k_cap)
    nhot = jnp.sum((counts > 0).astype(jnp.int32))
    lanes = data2d.shape[1]
    tile_w = rows_per_tile * lanes
    if gather_kernel == "dma":
        raw = _gather_tiles_dma_call(
            data2d, hot, k_cap=k_cap, rows_per_tile=rows_per_tile,
            interpret=interpret,
        )
        fetched = raw.reshape(k_cap, 2, tile_w)
    elif gather_kernel:
        # 2 DMA blocks per slot (tile + halo tile), addresses from the
        # scalar-prefetched hot ids
        raw = _gather_tiles_call(
            data2d, hot, k_cap=k_cap, rows_per_tile=rows_per_tile,
            interpret=interpret,
        )
        fetched = raw.reshape(k_cap, 2, tile_w)
    else:
        # XLA fallback: row-index take (slower per row, but O(k_cap) temp)
        ridx = hot[:, None] * jnp.int32(rows_per_tile) + jnp.arange(
            2 * rows_per_tile, dtype=jnp.int32
        )[None, :]
        fetched = data2d[ridx].reshape(k_cap, 2, tile_w)
    if packed:
        # unpack little-endian i32 words to elements (tiny: K slots only)
        w = fetched.reshape(k_cap, -1).astype(jnp.uint32)
        k_per_word = 4 // width
        ebits = 8 * width
        emask = (1 << ebits) - 1
        parts = [
            ((w >> jnp.uint32(ebits * j)) & jnp.uint32(emask))
            for j in range(k_per_word)
        ]
        elems = jnp.stack(parts, axis=-1).reshape(k_cap, -1)
    else:
        elems = fetched.reshape(k_cap, -1).astype(jnp.uint32)
    dt = jnp.uint8 if width == 1 else jnp.uint16
    slots = elems[:, :span_elems].astype(dt)
    n_cand, flat_idx, v0, v1 = exact_phase2(
        slots, hot, nhot, vtvr[0], vtvr[1],
        tile_elems=tile_elems, length=length, pairs_exact=pairs_exact,
        expected=expected_exact, signed_compare=signed_compare,
        recovery=recovery, p_cap=p_cap,
    )
    return jnp.concatenate(
        [
            jnp.stack([nhot, jnp.sum(counts), n_cand]),
            hot,
            counts[hot],
            flat_idx,
            v0,
            v1,
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "pairs", "length", "tile_rows", "width", "interpret",
        "fine_per_block", "k_cap", "rows_per_tile",
        "span_elems", "tile_elems", "signed_compare", "p_cap",
        "pairs_exact", "gather_kernel", "wc_run",
    ),
)
def _swar_counts_gather_call(
    packed2d, expected, valid, vtvr, expected_exact, recovery, *,
    pairs, length, tile_rows, width, interpret, fine_per_block, k_cap,
    rows_per_tile, span_elems, tile_elems, signed_compare,
    p_cap, pairs_exact, gather_kernel, wc_run=None,
):
    counts = _tile_counts_swar_call(
        packed2d, expected, valid, pairs=pairs, length=length,
        tile_rows=tile_rows, width=width, interpret=interpret,
        fine_per_block=fine_per_block, wc_run=wc_run,
    )
    combo = _hot_slots_and_combo(
        packed2d, counts,
        (vtvr, expected_exact, recovery, pairs_exact),
        k_cap=k_cap, rows_per_tile=rows_per_tile,
        span_elems=span_elems, tile_elems=tile_elems, length=length,
        signed_compare=signed_compare, p_cap=p_cap, width=width,
        packed=True, gather_kernel=gather_kernel, interpret=interpret,
    )
    return counts, combo


@functools.partial(
    jax.jit,
    static_argnames=(
        "pairs", "length", "tile_rows", "widen", "interpret",
        "k_cap", "span_elems", "tile_elems",
        "signed_compare", "p_cap", "width", "pairs_exact",
        "gather_kernel",
    ),
)
def _native_counts_gather_call(
    data2d, expected, valid, vtvr, expected_exact, recovery, *,
    pairs, length, tile_rows, widen, interpret, k_cap,
    span_elems, tile_elems, signed_compare, p_cap, width, pairs_exact,
    gather_kernel,
):
    counts = _tile_counts_call(
        data2d, expected, valid, pairs=pairs, length=length,
        tile_rows=tile_rows, widen=widen, interpret=interpret,
    )
    combo = _hot_slots_and_combo(
        data2d, counts,
        (vtvr, expected_exact, recovery, pairs_exact),
        k_cap=k_cap, rows_per_tile=tile_rows,
        span_elems=span_elems, tile_elems=tile_elems, length=length,
        signed_compare=signed_compare, p_cap=p_cap, width=width,
        packed=False, gather_kernel=gather_kernel, interpret=interpret,
    )
    return counts, combo


@functools.partial(
    jax.jit,
    static_argnames=(
        "pair_sets", "tile_rows", "width", "interpret", "fine_per_block",
        "k_cap", "rows_per_tile", "tile_elems", "p_cap", "lengths",
        "pairs_exacts", "signeds", "gather_kernel",
    ),
)
def _swar_multi_gather_call(
    packed2d, expected, active, valid, vtvr, exp_exacts, recoveries, *,
    pair_sets, tile_rows, width, interpret, fine_per_block, k_cap,
    rows_per_tile, tile_elems, p_cap, lengths, pairs_exacts, signeds,
    gather_kernel,
):
    """Fused multi-pattern step: ONE kernel pass over HBM counting every
    pattern (:func:`_tile_counts_swar_multi_call`), then the per-pattern
    fused hot-tile gather + EXACT phase 2 (:func:`_hot_slots_and_combo`),
    all in one executable.  Returns ``(counts_tuple, combos)`` where
    ``combos`` is the K per-pattern result buffers concatenated — the
    step's single D2H transaction for the whole keyword batch."""
    counts = _tile_counts_swar_multi_call(
        packed2d, expected, active, valid, pair_sets=pair_sets,
        tile_rows=tile_rows, width=width, interpret=interpret,
        fine_per_block=fine_per_block,
    )
    combos = []
    for k in range(len(pair_sets)):
        combos.append(
            _hot_slots_and_combo(
                packed2d, counts[k],
                (vtvr[k], exp_exacts[k], recoveries[k], pairs_exacts[k]),
                k_cap=k_cap, rows_per_tile=rows_per_tile,
                span_elems=tile_elems + lengths[k] - 1,
                tile_elems=tile_elems, length=lengths[k],
                signed_compare=signeds[k], p_cap=p_cap, width=width,
                packed=True, gather_kernel=gather_kernel,
                interpret=interpret,
            )
        )
    return counts, jnp.concatenate(combos)


def tile_counts_gather_pallas(
    pat: CompiledPattern,
    data2d: jnp.ndarray,
    valid_count: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    k_cap: int = 8,
    p_cap: int = 1024,
    interpret: bool = False,
    mode: str | None = None,
):
    """Fused phases 1 + 2 in ONE device dispatch.

    Returns device arrays ``(counts, combo)``: int32[T] per-tile prefilter
    counts (left on device — fetched only for the overflow fallback) and
    the single packed result buffer (see :func:`_hot_slots_and_combo`)
    carrying the hot-tile header plus the EXACT candidate offsets and
    recovery values.  On a dispatch-latency-dominated link (the axon relay
    costs ~28 ms per round trip plus ~20-30 ms per D2H transaction) every
    step costs exactly one dispatch and one small fetch.  If more than
    ``k_cap`` tiles are hot or more than ``p_cap`` candidates match,
    callers fetch ``counts`` and fall back to the batched gather
    (``dense.extract_hot_tiles_device``).

    Same tiling/halo contract as :func:`tile_counts_pallas`.
    """
    from .scan_jnp import (
        pattern_device_args,
        pattern_operand_cache,
        prefilter_checks,
    )

    rows, lanes = data2d.shape
    num_tiles = rows // tile_rows - 1
    packed = data2d.dtype == jnp.int32 and np.dtype(pat.dtype) != np.int32
    width = np.dtype(pat.dtype).itemsize
    L = pat.length
    tile_elems = tile_rows * LANES
    span_elems = tile_elems + L - 1
    cache = pattern_operand_cache(pat)
    vt_key = ("vtvr", valid_count, tile_elems)
    if vt_key not in cache:
        cache[vt_key] = jnp.asarray(
            [valid_count // tile_elems, valid_count % tile_elems],
            dtype=jnp.int32,
        )
    vtvr = cache[vt_key]
    _, _, exp_exact, recovery = pattern_device_args(pat)
    exact = dict(
        span_elems=span_elems,
        tile_elems=tile_elems,
        signed_compare=pat.signed_compare,
        p_cap=p_cap,
        k_cap=k_cap,
        pairs_exact=tuple(
            (int(c), int(p))
            for c, p in zip(pat.chk_shift_cur, pat.chk_shift_prev)
        ),
    )
    if mode is None:
        mode = (pallas_compute_mode() or "native") if not interpret else "native"
    if packed:
        mode = "swar"
    # dynamic hot-tile gather: manual-DMA kernel when it legalizes
    # ("dma" always works in interpret mode), XLA row take otherwise
    gather_kernel = "dma" if interpret else (pallas_gather_mode() or False)
    if mode == "swar":
        expected_splat, valid, static = swar_dispatch_args(
            pat, num_tiles, valid_count, tile_rows
        )
        packed2d = (
            data2d if data2d.dtype == jnp.int32
            else _pack_words(data2d, width=width)
        )
        return _swar_counts_gather_call(
            packed2d,
            expected_splat,
            valid,
            vtvr,
            exp_exact,
            recovery,
            interpret=interpret,
            rows_per_tile=tile_rows,
            gather_kernel=gather_kernel,
            **exact,
            **static,
        )
    pairs, exp_sel = prefilter_checks(pat)
    nat_key = ("native", valid_count, tile_elems)
    if nat_key not in cache:
        lim = valid_count - L
        cache[nat_key] = (
            jnp.asarray(exp_sel.astype(np.int32)),
            jnp.asarray(
                [lim // tile_elems, lim % tile_elems], dtype=jnp.int32
            ),
        )
    expected, valid = cache[nat_key]
    return _native_counts_gather_call(
        data2d,
        expected,
        valid,
        vtvr,
        exp_exact,
        recovery,
        pairs=pairs,
        length=L,
        tile_rows=tile_rows,
        widen=mode == "i32",
        interpret=interpret,
        width=width,
        gather_kernel=gather_kernel,
        **exact,
    )


def tile_counts_pallas(
    pat: CompiledPattern,
    data2d: jnp.ndarray,
    valid_count: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
    mode: str | None = None,
) -> jnp.ndarray:
    """Per-tile match counts for a (rows, LANES) element array.

    Contract (shared with ``scan_jnp.tile_counts_xla``): ``rows`` is
    ``(T+1) * tile_rows`` — T counted tiles plus one trailing tile of
    halo/padding, so every counted window reads real array data.  Returns
    int32[T] where tile t covers element positions
    [t*tile_rows*LANES, (t+1)*tile_rows*LANES).
    """
    from .scan_jnp import prefilter_checks

    pairs, exp_sel = prefilter_checks(pat)
    rows, lanes = data2d.shape
    num_tiles = rows // tile_rows - 1
    packed = data2d.dtype == jnp.int32 and np.dtype(pat.dtype) != np.int32
    elems_per_row = (
        lanes * (4 // np.dtype(pat.dtype).itemsize) if packed else lanes
    )
    tile_elems = tile_rows * elems_per_row
    if not pairs:
        # No literal checks (e.g. all-wildcard keyword): every valid window
        # matches; count directly.
        starts = np.arange(num_tiles) * tile_elems
        last_valid = valid_count - pat.length  # inclusive
        counts = np.clip(last_valid + 1 - starts, 0, tile_elems)
        return jnp.asarray(counts.astype(np.int32))
    if mode is None:
        mode = (pallas_compute_mode() or "native") if not interpret else "native"
    if packed:
        mode = "swar"  # pre-packed upload implies the SWAR layout
    if mode == "swar":
        width = np.dtype(pat.dtype).itemsize
        expected_splat, valid, static = swar_dispatch_args(
            pat, num_tiles, valid_count, tile_rows
        )
        if data2d.dtype == jnp.int32:
            packed2d = data2d  # pre-packed upload (swar_host_view)
        else:
            packed2d = _pack_words(data2d, width=width)
        counts = _tile_counts_swar_call(
            packed2d,
            expected_splat,
            valid,
            interpret=interpret,
            **static,
        )
    else:
        from .scan_jnp import pattern_operand_cache

        cache = pattern_operand_cache(pat)
        cnt_key = ("counts", valid_count, tile_elems)
        if cnt_key not in cache:
            lim = valid_count - pat.length
            cache[cnt_key] = (
                jnp.asarray(exp_sel.astype(np.int32)),
                jnp.asarray(
                    [lim // tile_elems, lim % tile_elems], dtype=jnp.int32
                ),
            )
        expected, valid = cache[cnt_key]
        counts = _tile_counts_call(
            data2d,
            expected,
            valid,
            pairs=pairs,
            length=pat.length,
            tile_rows=tile_rows,
            widen=mode == "i32",
            interpret=interpret,
        )
    return counts
