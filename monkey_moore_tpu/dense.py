"""Single-device dense search (layer L2 public surface).

``dense_search`` is the TPU-path equivalent of ``MonkeyMoore<Ty>::search``
(``src/core/monkey_moore.cpp:41-49``): in-memory element array in, list of
(offset, equivalency_map) out.

The production scan is **two-phase**:

1. *Device phase* — per-tile match counts at HBM bandwidth (Pallas kernel on
   TPU, ``ops/scan_pallas.py``; pure-XLA fallback, ``ops/scan_jnp.py``).
   Only ``4 bytes / 64 KiB`` of counts ever cross the device boundary.
2. *Host phase* — exact offsets extracted from the (rare) hot tiles with the
   vectorized NumPy matcher (``ops/scan_np.py``), plus recovery values read
   straight from the host buffer.

This replaces on-device offset compaction (``jnp.nonzero``), whose scatter
graph both compiles and runs orders of magnitude slower than the scan itself
at large chunk sizes.
"""

from __future__ import annotations

import threading
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from .config import MatchSemantics
from .ops.recover import recover_from_values, recovery_shifts
from .ops.scan_np import match_positions_np
from .ops.suppress import greedy_suppress
from .oracle import oracle_search
from .pattern import CompiledPattern

__all__ = [
    "dense_search",
    "dense_candidates",
    "two_phase_candidates",
    "tile_counts",
    "fused_count_extract",
    "fused_count_extract_start",
    "fused_count_extract_finish",
    "FusedPending",
    "fused_count_extract_multi",
    "fused_multi_eligible",
    "auto_k_cap",
    "FusedInfo",
    "extract_hot_tiles",
    "extract_hot_tiles_device",
    "TILE_ELEMS",
]

Result = Tuple[int, Dict[int, int]]

from .ops.scan_pallas import DEFAULT_TILE_ROWS, LANES

TILE_ELEMS = DEFAULT_TILE_ROWS * LANES  # 262144 elements per counted tile


def _use_pallas_backend(use_pallas: bool, interpret: bool, tile_elems: int) -> bool:
    if tile_elems % (8 * LANES) != 0:
        return False  # Mosaic tiles are (rows, LANES); 8 sublanes minimum
    if interpret:
        # interpret mode runs the element-dtype (native) kernel: int8 tiles
        # need 32 sublanes
        return tile_elems % (32 * LANES) == 0
    if not use_pallas:
        return False
    from .ops.scan_pallas import pallas_available, pallas_compute_mode

    if not pallas_available():
        return False
    if tile_elems % (32 * LANES) != 0:
        # sub-32-sublane count tiles only lower for the int32-operand SWAR
        # kernel (used for fine hot-tile gather granularity, cutting the
        # relay's slow D2H per hot tile)
        return pallas_compute_mode() == "swar"
    return True


def _prefilter_sel(pat):
    """Selected prefilter checks + the max window shift among them (the
    Pallas-eligibility bound)."""
    from .ops.scan_jnp import prefilter_checks

    pairs, exp = prefilter_checks(pat)
    return pairs, exp, max((c for c, _ in pairs), default=0)


def wants_packed(
    pat: CompiledPattern,
    tile_elems: int = TILE_ELEMS,
    use_pallas: bool = True,
) -> bool:
    """True when :func:`tile_counts` would scan via the SWAR Pallas kernel —
    callers producing device arrays (corpus grids, uploads) should then emit
    the packed little-endian i32 word layout (``swar_host_view`` /
    ``ResidentCorpus.grid_chunk(packed=True)``) so no separate packing pass
    runs before the scan."""
    pairs, _, max_shift = _prefilter_sel(pat)
    if not _use_pallas_backend(use_pallas, False, tile_elems):
        return False
    if max_shift >= LANES or not pairs:
        return False
    from .ops.scan_pallas import pallas_compute_mode

    return pallas_compute_mode() == "swar"


def tile_counts(
    pat: CompiledPattern,
    arr_device,
    valid_count: int,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_elems: int = TILE_ELEMS,
) -> np.ndarray:
    """Phase 1: int32[T] match counts per tile.

    ``arr_device`` is a device (or host) element array of ``(T+1)*tile_elems``
    elements — T counted tiles + one halo/padding tile.
    """
    from .utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    pairs, exp_sel, max_shift = _prefilter_sel(pat)
    if _use_pallas_backend(use_pallas, interpret, tile_elems) and (
        max_shift < LANES
    ):
        from .ops.scan_pallas import tile_counts_pallas

        if getattr(arr_device, "ndim", 1) == 2:
            # already in the kernel's 2-D layout (large resident corpora
            # are allocated this way — an eager flat->2D reshape would
            # materialize a second corpus-sized buffer)
            data2d = arr_device
        elif arr_device.dtype == np.int32 and np.dtype(pat.dtype) != np.int32:
            # pre-packed SWAR upload (swar_host_view): one i32 word holds
            # 4 bytes, rows stay LANES elements wide
            lanes32 = LANES * np.dtype(pat.dtype).itemsize // 4
            data2d = arr_device.reshape(-1, lanes32)
        else:
            data2d = arr_device.reshape(-1, LANES)
        tile_rows = tile_elems // LANES
        counts = tile_counts_pallas(
            pat,
            data2d,
            valid_count,
            tile_rows=tile_rows,
            interpret=interpret,
        )
    else:
        from .ops.scan_jnp import tile_counts_xla

        assert not (
            arr_device.dtype == np.int32 and np.dtype(pat.dtype) != np.int32
        ), "packed SWAR arrays require the Pallas backend (see wants_packed)"
        counts = tile_counts_xla(
            arr_device,
            jnp.int32(valid_count),
            jnp.asarray(exp_sel),
            pairs=pairs,
            length=pat.length,
            tile_elems=tile_elems,
        )
    return np.asarray(counts)


_EMPTY = (
    np.zeros(0, dtype=np.int64),
    np.zeros((0, 2), dtype=np.int64),
)

#: memo for multi-pattern batch device operands (see fused_count_extract_multi)
#: — guarded by ``_multi_memo_lock``; buffers pin to the backend active at
#: first use (single-backend assumption, like scan_jnp.pattern_operand_cache)
_MULTI_MEMO: dict = {}
_multi_memo_lock = threading.Lock()


def auto_k_cap(
    pat: CompiledPattern, valid_count: int, tile_elems: int, n_pairs: int
) -> int:
    """Hot-tile gather capacity for the fused step.

    Sized from the expected prefilter-FP positions on random data with 2x +
    slack headroom (hot tiles <= positions); the gather stays device-side,
    so a large cap costs HBM reads, not D2H bytes.  Additionally bounded by
    a slot-bytes budget (the fused step materializes ``k_cap`` slots of
    ``2 * tile_elems`` elements; 64 MiB — without the bound, large count
    tiles + a high-FP pattern drove a ~1 GiB device gather per chunk).
    """
    bits = 8 * np.dtype(pat.dtype).itemsize
    exp_fp = valid_count * (2.0 ** (-bits * max(1, n_pairs)))
    k_cap = int(min(2048, 1 << int(2 * exp_fp + 16).bit_length()))
    slot_bytes = 2 * tile_elems * np.dtype(pat.dtype).itemsize
    budget_slots = max(8, (64 * 1024 * 1024) // slot_bytes)
    if k_cap > budget_slots:
        k_cap = 1 << (budget_slots.bit_length() - 1)
    return k_cap


def _gather_fallback_bytes(pat: CompiledPattern, n_hot: int,
                           tile_elems: int) -> int:
    """Approximate D2H bytes of :func:`extract_hot_tiles_device`'s batched
    fetch: ``n_hot`` padded to a power of two, one tile+halo span per slot
    — the dominant transfer of the degraded (overflow/all-wildcard)
    steps, so the d2h stat must include it."""
    if n_hot <= 0:
        return 0
    n_pad = 1 << (n_hot - 1).bit_length()
    span = tile_elems + pat.length - 1
    return n_pad * span * np.dtype(pat.dtype).itemsize


class FusedInfo(NamedTuple):
    """Stats sidecar of :func:`fused_count_extract` (device-computed)."""

    hot_tiles: int  #: tiles with a nonzero prefilter count
    prefilter_total: int  #: sum of prefilter counts (int32 stats field)
    candidates: int = 0  #: exact candidates extracted this step
    fallback: bool = False  #: capacity overflow → counts fetch + batched gather
    d2h_bytes: int = 0  #: bytes this step shipped device→host
    #: per-shard exact candidate counts (mesh paths only; None on the
    #: single-device paths) — the load-balance evidence the scaling harness
    #: reports
    per_device: tuple = None


class FusedPending(NamedTuple):
    """An in-flight fused step: device futures + the metadata
    :func:`fused_count_extract_finish` needs to fetch and decode them.

    JAX dispatch is asynchronous — ``counts_dev``/``combo_dev`` are device
    buffers whose computation may still be running.  Keeping ``depth``
    pendings alive overlaps step ``k+1``'s dispatch/execution with step
    ``k``'s result fetch, hiding the link's fixed per-transaction latency
    (the engine's ``pipeline_depth`` knob; docs/PERF.md).  ``eager`` holds
    an already-final result for the branches that cannot pipeline (the
    all-wildcard special case).
    """

    counts_dev: object
    combo_dev: object
    pat: object
    arr_device: object
    valid_count: int
    tile_elems: int
    grid_offset: int
    k_cap: int
    p_cap: int
    eager: tuple = None


def fused_count_extract_start(
    pat: CompiledPattern,
    arr_device,
    valid_count: int,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_elems: int = TILE_ELEMS,
    grid_offset: int = 0,
    k_cap: int | None = None,
    p_cap: int = 1024,
) -> "FusedPending":
    """Dispatch phases 1 + 2 WITHOUT fetching the result buffer.

    The async half of :func:`fused_count_extract`: returns immediately
    after enqueueing the fused device step, so a caller can dispatch the
    next chunk before paying the device→host round trip for this one
    (:class:`FusedPending`).
    """
    import jax.numpy as jnp

    L = pat.length
    pairs, exp_sel, max_shift = _prefilter_sel(pat)
    pallas_ok = _use_pallas_backend(use_pallas, interpret, tile_elems) and (
        max_shift < LANES
    )
    if k_cap is None:
        k_cap = auto_k_cap(pat, valid_count, tile_elems, len(pairs))
    if not pairs:
        # all-wildcard keywords match every window — every tile is hot, so
        # fusion buys nothing; use the two-dispatch path's host special-case
        counts = tile_counts(
            pat, arr_device, valid_count, use_pallas=use_pallas,
            interpret=interpret, tile_elems=tile_elems,
        )
        offs, vals = extract_hot_tiles_device(
            pat, arr_device, counts, valid_count, tile_elems, grid_offset
        )
        info = FusedInfo(
            int((counts > 0).sum()), int(counts.sum()),
            candidates=len(offs), fallback=True,
            d2h_bytes=counts.nbytes + _gather_fallback_bytes(
                pat, int((counts > 0).sum()), tile_elems
            ),
        )
        return FusedPending(
            None, None, pat, arr_device, valid_count, tile_elems,
            grid_offset, k_cap, p_cap, eager=(offs, vals, info),
        )

    packed = arr_device.dtype == np.int32 and np.dtype(pat.dtype) != np.int32
    if pallas_ok:
        from .ops.scan_pallas import tile_counts_gather_pallas

        if getattr(arr_device, "ndim", 1) == 2:
            data2d = arr_device
        elif packed:
            lanes32 = LANES * np.dtype(pat.dtype).itemsize // 4
            data2d = arr_device.reshape(-1, lanes32)
        else:
            data2d = arr_device.reshape(-1, LANES)
        counts_dev, combo_dev = tile_counts_gather_pallas(
            pat,
            data2d,
            valid_count,
            tile_rows=tile_elems // LANES,
            k_cap=k_cap,
            p_cap=p_cap,
            interpret=interpret,
        )
    else:
        from .ops.scan_jnp import tile_counts_gather_xla

        assert not packed, (
            "packed SWAR arrays require the Pallas backend (see wants_packed)"
        )
        flat = (
            arr_device.reshape(-1)
            if getattr(arr_device, "ndim", 1) == 2
            else arr_device
        )
        from .ops.scan_jnp import pattern_device_args, pattern_operand_cache

        _, _, exp_exact, recovery = pattern_device_args(pat)
        # memoized device copies of the per-step operands (each small
        # upload is a relay round trip — same rationale as the Pallas
        # path's swar_dispatch_args memo)
        cache = pattern_operand_cache(pat)
        okey = ("xla_step", valid_count, tile_elems)
        if okey in cache:
            exp_sel_dev, vtvr = cache[okey]
        else:
            exp_sel_dev = jnp.asarray(exp_sel)
            vtvr = jnp.asarray(
                [valid_count // tile_elems, valid_count % tile_elems],
                dtype=jnp.int32,
            )
            cache[okey] = (exp_sel_dev, vtvr)
        counts_dev, combo_dev = tile_counts_gather_xla(
            flat,
            jnp.int32(valid_count),
            exp_sel_dev,
            vtvr,
            exp_exact,
            recovery,
            pairs=pairs,
            length=L,
            tile_elems=tile_elems,
            k_cap=k_cap,
            span=tile_elems + L - 1,
            p_cap=p_cap,
            signed_compare=pat.signed_compare,
            pairs_exact=tuple(
                (int(c), int(p))
                for c, p in zip(pat.chk_shift_cur, pat.chk_shift_prev)
            ),
        )
    return FusedPending(
        counts_dev, combo_dev, pat, arr_device, valid_count, tile_elems,
        grid_offset, k_cap, p_cap,
    )


def fused_count_extract_finish(
    pending: "FusedPending",
) -> Tuple[np.ndarray, np.ndarray, "FusedInfo"]:
    """Fetch + decode an in-flight fused step (the blocking half)."""
    if pending.eager is not None:
        return pending.eager
    # ONE device→host transaction per step: [n_hot, total, n_cand,
    # hot_ids, hot_counts, flat_idx, v0, v1] — every extra transaction
    # costs ~20-30 ms of relay latency regardless of size
    combo = np.asarray(pending.combo_dev)
    k_cap, p_cap = pending.k_cap, pending.p_cap
    info = _combo_info(combo, k_cap, p_cap)
    if info.hot_tiles == 0:
        return *_EMPTY, info
    if info.fallback:
        # capacity overflow: fetch the full counts and run the batched
        # gather + host extraction (degraded mode — surfaced via
        # ``info.fallback`` so callers can log/count it)
        counts_np = np.asarray(pending.counts_dev)
        offs, vals = extract_hot_tiles_device(
            pending.pat, pending.arr_device, counts_np,
            pending.valid_count, pending.tile_elems, pending.grid_offset,
        )
        info = info._replace(
            candidates=len(offs),
            d2h_bytes=info.d2h_bytes + counts_np.nbytes
            + _gather_fallback_bytes(
                pending.pat, int((counts_np > 0).sum()),
                pending.tile_elems,
            ),
        )
        return offs, vals, info
    offsets, values = _parse_combo(
        combo, k_cap, p_cap, pending.tile_elems, pending.grid_offset
    )
    return offsets, values, info


def fused_count_extract(
    pat: CompiledPattern,
    arr_device,
    valid_count: int,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_elems: int = TILE_ELEMS,
    grid_offset: int = 0,
    k_cap: int | None = None,
    p_cap: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, "FusedInfo"]:
    """Phases 1 + 2 for device-resident data in ONE device dispatch.

    Returns ``(offsets, values, info)``.  The jitted step computes per-tile
    prefilter counts, gathers the first ``k_cap`` hot tiles, re-evaluates
    them with the FULL exact check tables on device (``scan_jnp.
    exact_phase2`` — prefilter false positives never reach the host), and
    packs the hot-tile header + exact candidate offsets + recovery values
    into one int32 buffer: the step's single D2H transaction.  On the relay
    (fixed ~28 ms dispatch, ~20-30 ms per D2H transaction) this removes the
    separate extraction dispatch, the counts-array transfer, and any
    per-hot-tile data transfer relative to ``tile_counts`` +
    :func:`extract_hot_tiles_device`.  ``k_cap`` auto-sizes from the
    expected prefilter false-positive rate (capped checks admit ~2^-8c of
    random windows); overflowing ``k_cap`` tiles or ``p_cap`` candidates
    falls back to the batched path (one extra dispatch — rare).

    TPU-native replacement for the reference's per-thread "scan then walk
    the block again" structure (``src/core/search_engine.cpp:107-168``).
    Split into :func:`fused_count_extract_start` (async dispatch) +
    :func:`fused_count_extract_finish` (fetch) so chunked callers can
    pipeline steps (``SearchConfig.pipeline_depth``).
    """
    return fused_count_extract_finish(
        fused_count_extract_start(
            pat, arr_device, valid_count, use_pallas=use_pallas,
            interpret=interpret, tile_elems=tile_elems,
            grid_offset=grid_offset, k_cap=k_cap, p_cap=p_cap,
        )
    )


#: fused result-buffer layout, shared byte-for-byte by the two assemblers
#: (``scan_jnp.fused_body_xla``, ``scan_pallas._hot_slots_and_combo``) and
#: every decoder below + ``parallel.sharded.parse_sharded_combos``:
#: ``[n_hot, prefilter_total, n_cand, hot_ids[k_cap], hot_counts[k_cap],
#:   flat_idx[p_cap], v0[p_cap], v1[p_cap]]`` — change it in ALL places or
#: offsets silently decode from the wrong region.
COMBO_HEADER = 3


def combo_fields(combo: np.ndarray, k_cap: int, p_cap: int):
    """Decode one packed result buffer into its raw fields:
    ``(n_hot, prefilter_total, n_cand, hot_ids, flat_idx, v0, v1)``
    (candidate arrays trimmed to ``n_cand``)."""
    n_hot, total, n_cand = int(combo[0]), int(combo[1]), int(combo[2])
    hot = combo[COMBO_HEADER : COMBO_HEADER + k_cap].astype(np.int64)
    base = COMBO_HEADER + 2 * k_cap
    m = min(n_cand, p_cap)
    flat_idx = combo[base : base + p_cap][:m].astype(np.int64)
    v0 = combo[base + p_cap : base + 2 * p_cap][:m]
    v1 = combo[base + 2 * p_cap : base + 3 * p_cap][:m]
    return n_hot, total, n_cand, hot, flat_idx, v0, v1


def _combo_info(combo: np.ndarray, k_cap: int, p_cap: int) -> FusedInfo:
    n_hot, total, n_cand = int(combo[0]), int(combo[1]), int(combo[2])
    return FusedInfo(
        n_hot, total, candidates=n_cand, d2h_bytes=combo.nbytes,
        fallback=n_hot > k_cap or n_cand > p_cap,
    )


def _parse_combo(combo, k_cap, p_cap, tile_elems, grid_offset):
    """Decode one fused result buffer → (offsets, values)."""
    _, _, n_cand, hot, flat_idx, v0, v1 = combo_fields(combo, k_cap, p_cap)
    if n_cand == 0:
        return _EMPTY
    slot, rel = flat_idx // tile_elems, flat_idx % tile_elems
    offsets = hot[slot] * tile_elems + rel + grid_offset
    values = np.stack([v0, v1], axis=1).astype(np.int64)
    return offsets, values


def fused_multi_eligible(
    pats: List[CompiledPattern],
    tile_elems: int = TILE_ELEMS,
    interpret: bool = False,
) -> bool:
    """True when :func:`fused_count_extract_multi` can run this batch (the
    SWAR kernel's layout/shift constraints).  Callers use this to decide
    whether to produce the packed corpus layout for the chunk."""
    from .ops.scan_jnp import canonical_check_tables
    from .ops.scan_pallas import LANES, pallas_compute_mode

    width = np.dtype(pats[0].dtype).itemsize
    if any(np.dtype(p.dtype).itemsize != width for p in pats):
        return False
    if tile_elems % (8 * LANES) != 0:
        return False
    if not interpret and pallas_compute_mode() != "swar":
        return False
    pair_sets, _, _ = canonical_check_tables(pats)
    if any(len(prs) == 0 for prs in pair_sets):
        return False
    if any(cs >= LANES for prs in pair_sets for cs, _ in prs):
        return False
    return True


def multi_pattern_tables(pair_sets, exp_list, active_list, width: int):
    """Rectangular multi-pattern kernel operands from the canonical check
    tables: ``(pair_sets_padded, expected (K, C) splatted i32 device array,
    active (K, C) -1/0 device array)`` — padded with inactive ``(1, 0)``
    checks so the static pair grid is rectangular.  Shared by the
    single-chip batch step and the sharded multi step."""
    import jax.numpy as jnp

    K = len(pair_sets)
    c_pad = max(len(e) for e in exp_list)
    ones_pat = 0x01010101 if width == 1 else 0x00010001
    exp_mat = np.zeros((K, c_pad), dtype=np.uint64)
    act_mat = np.zeros((K, c_pad), dtype=np.int64)
    pair_sets_padded = []
    for k, (prs, e, a) in enumerate(zip(pair_sets, exp_list, active_list)):
        exp_mat[k, : len(e)] = e.astype(np.uint64)
        act_mat[k, : len(a)] = np.where(a, -1, 0)
        pair_sets_padded.append(
            tuple(prs) + tuple((1, 0) for _ in range(c_pad - len(prs)))
        )
    expected = jnp.asarray(
        ((exp_mat * ones_pat) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    )
    active = jnp.asarray(act_mat.astype(np.int32))  # -1 live, 0 pad
    return pair_sets_padded, expected, active


def fused_count_extract_multi(
    pats: List[CompiledPattern],
    arr_device,
    valid_count: int,
    tile_elems: int = TILE_ELEMS,
    k_cap: int | None = None,
    p_cap: int = 1024,
    interpret: bool = False,
    grid_offset: int = 0,
):
    """Fused phases 1 + 2 for MANY patterns in ONE device dispatch.

    The multi-keyword twin of :func:`fused_count_extract`: the corpus is
    read from HBM once (``scan_pallas._tile_counts_swar_multi_call``
    evaluates every pattern per tile, sharing SWAR diff arrays across
    patterns), each pattern's hot tiles are gathered + exactly re-checked
    on device, and the K result buffers come back as ONE D2H transaction.
    Returns a list of ``(offsets, values, FusedInfo)`` per pattern, or
    ``None`` when the batch is not SWAR-eligible (callers fall back to the
    XLA multi-count path, ``scan_jnp.tile_counts_multi_xla``).

    The reference runs its whole engine once per keyword
    (``src/core/search_engine.cpp:23``); here K keywords cost one corpus
    sweep plus O(total matches) transfer.
    """
    import jax.numpy as jnp

    from .ops.scan_jnp import (
        canonical_check_tables,
        pattern_device_args,
    )
    from .ops.scan_pallas import (
        LANES,
        _swar_multi_gather_call,
        pallas_gather_mode,
    )

    if not fused_multi_eligible(pats, tile_elems, interpret):
        return None
    width = np.dtype(pats[0].dtype).itemsize
    pair_sets, exp_list, active_list = canonical_check_tables(pats)

    packed = arr_device.dtype == np.int32
    if not packed:
        return None
    lanes32 = LANES * width // 4
    data2d = (
        arr_device
        if getattr(arr_device, "ndim", 1) == 2
        else arr_device.reshape(-1, lanes32)
    )
    rows_per_tile = tile_elems // LANES
    num_tiles = data2d.shape[0] // rows_per_tile - 1

    if k_cap is None:
        k_cap = max(
            auto_k_cap(pat, valid_count, tile_elems,
                       int(np.count_nonzero(act)))
            for pat, act in zip(pats, active_list)
        )

    # Batch device operands, memoized: the interactive workflow re-scans
    # the same keyword batch across chunks/searches (compile_pattern
    # memoizes, so identical keywords give identical pattern objects) and
    # every small host->device upload is a relay round trip.  The value
    # holds strong pattern refs so ids stay stable.
    memo_key = (
        tuple(id(p) for p in pats), valid_count, tile_elems, num_tiles,
    )
    with _multi_memo_lock:
        hit = _MULTI_MEMO.get(memo_key)
    if hit is not None:
        _, expected, active, valid, vtvr, pair_sets_padded, fpb = hit
        block_rows = rows_per_tile * fpb
        K = len(pats)
    else:
        K = len(pats)
        pair_sets_padded, expected, active = multi_pattern_tables(
            pair_sets, exp_list, active_list, width
        )

        # shared dispatch-block geometry + per-pattern boundary encodings
        from .ops.scan_pallas import dispatch_grouping

        block_rows, fpb = dispatch_grouping(
            num_tiles, rows_per_tile, width, n_patterns=K
        )
        block_elems = block_rows * LANES
        valid = jnp.asarray(np.stack(
            [
                [
                    (valid_count - p.length) // block_elems,
                    (valid_count - p.length) % block_elems,
                ]
                for p in pats
            ]
        ).astype(np.int32))
        vtvr = jnp.asarray(
            [[valid_count // tile_elems, valid_count % tile_elems]] * K,
            dtype=jnp.int32,
        )
        with _multi_memo_lock:
            if len(_MULTI_MEMO) >= 64:
                _MULTI_MEMO.clear()
            _MULTI_MEMO[memo_key] = (
                tuple(pats), expected, active, valid, vtvr,
                pair_sets_padded, fpb,
            )
    exp_exacts, recoveries, pairs_exacts = [], [], []
    for p in pats:
        _, _, ee, rec = pattern_device_args(p)
        exp_exacts.append(ee)
        recoveries.append(rec)
        pairs_exacts.append(
            tuple(
                (int(c), int(pp))
                for c, pp in zip(p.chk_shift_cur, p.chk_shift_prev)
            )
        )
    gather_kernel = "dma" if interpret else (pallas_gather_mode() or False)
    counts_dev, combos_dev = _swar_multi_gather_call(
        data2d, expected, active,
        valid, vtvr, tuple(exp_exacts), tuple(recoveries),
        pair_sets=tuple(pair_sets_padded), tile_rows=block_rows,
        width=width, interpret=interpret, fine_per_block=fpb,
        k_cap=k_cap, rows_per_tile=rows_per_tile, tile_elems=tile_elems,
        p_cap=p_cap, lengths=tuple(p.length for p in pats),
        pairs_exacts=tuple(pairs_exacts),
        signeds=tuple(p.signed_compare for p in pats),
        gather_kernel=gather_kernel,
    )
    combos = np.asarray(combos_dev).reshape(K, -1)
    out = []
    for k, p in enumerate(pats):
        info = _combo_info(combos[k], k_cap, p_cap)
        if info.hot_tiles == 0:
            out.append((*_EMPTY, info))
        elif info.fallback:
            counts_np = np.asarray(counts_dev[k])
            offs, vals = extract_hot_tiles_device(
                p, arr_device, counts_np, valid_count, tile_elems,
                grid_offset,
            )
            info = info._replace(
                candidates=len(offs),
                d2h_bytes=info.d2h_bytes + counts_np.nbytes
                + _gather_fallback_bytes(
                    p, int((counts_np > 0).sum()), tile_elems
                ),
            )
            out.append((offs, vals, info))
        else:
            offs, vals = _parse_combo(
                combos[k], k_cap, p_cap, tile_elems, grid_offset
            )
            out.append((offs, vals, info))
    return out


def two_phase_candidates(
    pat: CompiledPattern,
    data: np.ndarray,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_elems: int = TILE_ELEMS,
) -> Tuple[np.ndarray, np.ndarray]:
    """All matching window offsets in *data* (host element array), plus the
    recovery values [M, 2] read from the host buffer."""
    import jax.numpy as jnp

    data = np.ascontiguousarray(data, dtype=pat.dtype)
    n = len(data)
    L = pat.length
    if n < L:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2), dtype=np.int64)

    t_count = -(-n // tile_elems)
    arr = np.zeros((t_count + 1) * tile_elems, dtype=pat.dtype)
    arr[:n] = data
    counts = tile_counts(
        pat,
        jnp.asarray(arr),
        n,
        use_pallas=use_pallas,
        interpret=interpret,
        tile_elems=tile_elems,
    )
    return extract_hot_tiles(pat, data, counts, tile_elems)


def extract_hot_tiles(
    pat: CompiledPattern,
    data: np.ndarray,
    counts: np.ndarray,
    tile_elems: int = TILE_ELEMS,
    grid_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Phase 2: exact offsets + recovery values from tiles with count > 0.

    ``data`` is the host element buffer covering the counted region plus any
    trailing halo; ``grid_offset`` shifts reported offsets (for chunked
    scans).  Each hot tile costs one vectorized NumPy pass over
    ``tile_elems + L - 1`` elements.
    """
    n = len(data)
    L = pat.length
    shifts = recovery_shifts(pat)
    hot = np.nonzero(counts)[0]
    all_offsets = []
    for t in hot.tolist():
        s0 = t * tile_elems
        sl = data[s0 : min(n, s0 + tile_elems + L - 1)]
        pos = match_positions_np(pat, sl)
        pos = pos[pos < tile_elems] + s0
        all_offsets.append(pos)
    if not all_offsets:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2), dtype=np.int64)
    offsets = np.concatenate(all_offsets)
    values = np.stack(
        [
            data[np.minimum(offsets + shifts[0], n - 1)].astype(np.int64),
            data[
                np.minimum(
                    offsets + (shifts[1] if len(shifts) > 1 else shifts[0]),
                    n - 1,
                )
            ].astype(np.int64),
        ],
        axis=1,
    )
    return offsets + grid_offset, values


def extract_hot_tiles_device(
    pat: CompiledPattern,
    arr_device,
    counts: np.ndarray,
    valid_count: int,
    tile_elems: int = TILE_ELEMS,
    grid_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Phase 2 for device-resident corpora with no host mirror: fetch only
    the hot tiles' bytes device→host (``tile_elems + L - 1`` elements each)
    and run the exact matcher on them.

    ``arr_device`` is the same array given to :func:`tile_counts` — either a
    flat element array or the packed little-endian i32 SWAR view.
    """
    L = pat.length
    itemsize = np.dtype(pat.dtype).itemsize
    packed = arr_device.dtype == np.int32 and np.dtype(pat.dtype) != np.int32
    elems_per_word = 4 // itemsize
    total = (
        arr_device.size * elems_per_word if packed else arr_device.size
    )
    shifts = recovery_shifts(pat)
    hot = np.nonzero(counts)[0]
    if len(hot) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2), dtype=np.int64)

    # ONE batched gather for every hot tile: each device operation pays the
    # full dispatch round-trip (~28 ms on the development relay), so
    # per-tile slicing would cost n_hot dispatches.  The hot count is
    # padded to the next power of two (duplicated last tile) to bound the
    # number of distinct gather shapes the compile cache must hold.
    two_d = getattr(arr_device, "ndim", 1) == 2
    span_elems = tile_elems + L - 1
    if packed:
        span_w = span_elems // elems_per_word + 2
        w0s = hot * (tile_elems // elems_per_word)
    else:
        span_w = span_elems
        w0s = hot * tile_elems
    n_pad = 1 << int(len(hot) - 1).bit_length()
    w0s_pad = np.concatenate(
        [w0s, np.repeat(w0s[-1:], n_pad - len(w0s))]
    ).astype(np.int64)
    if two_d:
        per_row = arr_device.shape[1]
        r0s = w0s_pad // per_row
        rows_span = span_w // per_row + 2
        idx = np.clip(
            r0s[:, None] + np.arange(rows_span)[None, :],
            0, arr_device.shape[0] - 1,
        )
        fetched = np.asarray(arr_device[idx]).reshape(n_pad, -1)
        word_base = r0s * per_row  # storage index of each fetched row 0
    else:
        idx = np.clip(
            w0s_pad[:, None] + np.arange(span_w)[None, :],
            0, arr_device.shape[0] - 1,
        )
        fetched = np.asarray(arr_device[idx])
        word_base = w0s_pad

    all_offsets = []
    all_values = []
    for i, t in enumerate(hot.tolist()):
        s0 = t * tile_elems
        s1 = min(total, s0 + tile_elems + L - 1)
        if packed:
            w0, w1 = s0 // elems_per_word, -(-s1 // elems_per_word)
            sl = fetched[i][w0 - word_base[i] : w1 - word_base[i]]
            sl = sl.view(pat.dtype)[s0 - w0 * elems_per_word :][: s1 - s0]
        else:
            sl = fetched[i][s0 - word_base[i] : s1 - word_base[i]]
        # trim device padding past the valid element count
        sl = sl[: max(0, valid_count - s0)]
        pos = match_positions_np(pat, sl)
        pos = pos[pos < tile_elems]
        if len(pos):
            v0 = sl[np.minimum(pos + shifts[0], len(sl) - 1)].astype(np.int64)
            v1 = sl[
                np.minimum(
                    pos + (shifts[1] if len(shifts) > 1 else shifts[0]),
                    len(sl) - 1,
                )
            ].astype(np.int64)
            all_offsets.append(pos + s0)
            all_values.append(np.stack([v0, v1], axis=1))
    if not all_offsets:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 2), dtype=np.int64)
    return (
        np.concatenate(all_offsets) + grid_offset,
        np.concatenate(all_values),
    )


def dense_candidates(
    pat: CompiledPattern,
    data: np.ndarray,
    use_pallas: bool = True,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """All matching window offsets in *data*, plus recovery values [M, 2]."""
    return two_phase_candidates(
        pat, data, use_pallas=use_pallas, interpret=interpret
    )


def dense_search(
    pat: CompiledPattern,
    data: np.ndarray,
    semantics: MatchSemantics = MatchSemantics.GREEDY,
    use_pallas: bool = True,
    interpret: bool = False,
) -> List[Result]:
    """Search an in-memory element array; returns [(offset, values_map), ...].

    ``semantics`` selects ALL (every match), GREEDY (dense + advance replay,
    default), or REFERENCE (delegates to the exact sequential walker).
    """
    if pat.length < 2:
        raise ValueError("pattern length must be >= 2")
    if semantics is MatchSemantics.REFERENCE:
        return oracle_search(pat, data)

    offsets, values = two_phase_candidates(
        pat, data, use_pallas=use_pallas, interpret=interpret
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
