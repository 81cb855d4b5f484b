#!/usr/bin/env python
"""Headline benchmark: 8-bit relative-search scan throughput on one chip.

Mirrors the reference's benchmark setup (``benchmarks/bench_search.cpp:29,67``:
random data, 5-char keyword "abcde", bytes/s) on device-resident data — the
interactive ROM-exploration workload where the corpus is loaded to HBM once
and searched repeatedly.  The corpus is generated directly in HBM (threefry,
seed per chunk) in the scan kernel's packed SWAR 2-D layout; each timed step
runs the full production path — ONE fused dispatch computing the tile-count
prefilter and gathering any hot tiles, with exact extraction on the fetched
rows (``dense.fused_count_extract``).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N,
     "pct_hbm_roofline": N}

``vs_baseline`` compares against the reference C++ core measured on this
host (BASELINE_MEASURED.json, reproducible via ``tools/refbench/run.py``;
single-thread, the reference benchmark's own setup).  ``pct_hbm_roofline``
is the end-to-end rate as a percentage of the chip's HBM read bandwidth —
the speed-of-light for a scan that must touch every byte (docs/PERF.md).
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# 12 GiB default: the v5e's 16 GiB HBM minus fill/gather slack.  The relay's
# fixed per-transaction cost (~31 ms floor measured this session) dominates
# small corpora; the biggest resident corpus amortizes it best (measured
# 277 GB/s at 8 GiB -> 370 GB/s at 12 GiB, pipelined x3).
DATA_MB = int(os.environ.get("MMTPU_BENCH_MB", "12288"))
WARMUP = int(os.environ.get("MMTPU_BENCH_WARMUP", "3"))
ITERS = int(os.environ.get("MMTPU_BENCH_ITERS", "15"))
# 8 KiB count tiles: the kernel auto-groups 256 of them per 2 MiB dispatch
# block (full kernel rate) while any hot-tile gather ships only
# 8 KiB + L - 1 bytes per hot tile over the slow relay D2H path
TILE_ROWS = int(os.environ.get("MMTPU_BENCH_TILE_ROWS", "8"))
# hot-tile gather capacity: 0 = auto-size from the expected prefilter
# false-positive rate (the gather stays on device; only exact candidates
# cross D2H)
K_CAP = int(os.environ.get("MMTPU_BENCH_KCAP", "0")) or None

#: HBM read bandwidth by device kind, GB/s (v5e: 16 GiB HBM2E @ ~819 GB/s;
#: v4: 32 GiB @ ~1228 GB/s; v5p ~2765; v6e ~1640).
HBM_GBPS = {
    "TPU v5 lite": 819.0,
    "TPU v5litepod": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
}


def reference_baseline() -> float:
    path = REPO / "BASELINE_MEASURED.json"
    try:
        blob = json.loads(path.read_text())
        for key, values in blob.items():
            if key.startswith("measured"):
                return float(values["BM_Search/Relative/8-Bit"])
    except Exception:
        pass
    return 5.881e8


def main():
    import jax
    import jax.numpy as jnp

    from monkey_moore_tpu.dense import fused_count_extract
    from monkey_moore_tpu.ops.scan_pallas import LANES, pallas_compute_mode
    from monkey_moore_tpu.pattern import compile_pattern

    tile_elems = TILE_ROWS * LANES
    n = DATA_MB * 1024 * 1024
    assert n % tile_elems == 0
    pat = compile_pattern("abcde")

    # Fail fast (clear message, not a compile dump) if the corpus + working
    # set cannot fit device memory.  The fused step needs the corpus plus
    # ~256 MiB of fill/gather slack (the gather itself is O(k_cap)).
    dev0 = jax.devices()[0]
    limit = None
    try:
        limit = dev0.memory_stats().get("bytes_limit")
    except Exception:
        pass
    if limit is None:
        hbm_gib = {"TPU v5 lite": 16, "TPU v5litepod": 16, "TPU v4": 32,
                   "TPU v5p": 95, "TPU v6 lite": 32}.get(dev0.device_kind)
        limit = hbm_gib * (1 << 30) * 63 // 64 if hbm_gib else None
    slack = 256 * 1024 * 1024
    if limit is not None and n + slack > limit:
        print(
            f"error: MMTPU_BENCH_MB={DATA_MB} needs {n + slack} bytes but "
            f"{dev0.device_kind} provides {limit}; lower MMTPU_BENCH_MB",
            file=sys.stderr,
        )
        return 1

    if pallas_compute_mode() == "swar":
        # Generate the corpus directly in HBM as packed random words in the
        # SWAR kernel's 2-D operand layout (no host→device transfer — the
        # tunnel used for development uploads at only a few MB/s, and an
        # eager flat->2D reshape would materialize a second corpus-sized
        # buffer).  Chunked threefry with buffer donation keeps peak HBM at
        # corpus + one 256 MiB chunk.
        from monkey_moore_tpu.ops.scan_pallas import alloc_fine_tiles

        lanes32 = LANES // 4
        # counted tiles rounded so the kernel's dispatch grouping engages
        # (+1 halo tile); indivisible tile counts silently cost ~5x
        tiles = alloc_fine_tiles(n, tile_elems) + 1
        rows_total = tiles * tile_elems // 4 // lanes32
        fill_rows = (64 * 1024 * 1024) // lanes32  # 256 MiB per fill

        @functools.partial(
            jax.jit, donate_argnums=0, static_argnames=("m",)
        )
        def fill(buf, key, row0, *, m):
            w = jax.random.bits(key, (m, lanes32), dtype=jnp.uint32)
            w = jax.lax.bitcast_convert_type(w, jnp.int32)
            return jax.lax.dynamic_update_slice(buf, w, (row0, 0))

        data = jnp.zeros((rows_total, lanes32), dtype=jnp.int32)
        corpus_rows = n // 4 // lanes32
        for i, row0 in enumerate(range(0, corpus_rows, fill_rows)):
            m = min(fill_rows, corpus_rows - row0)
            data = fill(data, jax.random.PRNGKey(i), jnp.int32(row0), m=m)
    else:
        # host-backed path (CPU runs / toolchains with element-dtype
        # kernels): classic host buffer, mirroring the reference bench
        rng = np.random.default_rng(42)
        arr = np.zeros(n + tile_elems, dtype=np.uint8)
        arr[:n] = rng.integers(0, 256, n, dtype=np.uint8)
        data = jnp.asarray(arr)
    data = jax.block_until_ready(data)

    def step():
        # full production path: ONE fused dispatch computes tile counts AND
        # gathers hot tiles; the host fetches the 2+2k-int header (plus the
        # gathered rows when hot) and runs exact extraction on them
        offs, vals, info = fused_count_extract(
            pat, data, n, tile_elems=tile_elems, k_cap=K_CAP
        )
        return info

    step()  # compile
    t0 = time.perf_counter()
    for _ in range(WARMUP):
        step()
    warm_each = (time.perf_counter() - t0) / max(1, WARMUP)
    # Bound total measurement time: the relay's dispatch floor drifts
    # 24-75+ ms between sessions and can wedge for minutes; keep the
    # recorded run alive by capping iterations to a ~90 s budget (never
    # fewer than 3) instead of a fixed count.
    iters = max(3, min(ITERS, int(90.0 / max(warm_each, 1e-9))))

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)

    # Pipelined steady state (the engine's production loop,
    # SearchConfig.pipeline_depth): keep DEPTH fused steps in flight so
    # step k+1's dispatch/execution overlaps step k's result fetch.  Every
    # step's combo buffer is still fetched device→host (the only timing
    # robust to the relay's async mirage, docs/PERF.md) — just one step
    # later.  Total/N is the honest steady-state rate.
    from collections import deque

    from monkey_moore_tpu.dense import (
        fused_count_extract_finish,
        fused_count_extract_start,
    )

    # depth 3: the curve is flat past ~3 (368 GB/s at x3 vs 377 at x8,
    # same session — the residual is the relay's serialized
    # per-transaction cost, not queue depth), and x3 is the apparatus the
    # recorded rounds used
    depth = max(1, int(os.environ.get("MMTPU_BENCH_PIPELINE", "3")))
    pend = deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        pend.append(
            fused_count_extract_start(
                pat, data, n, tile_elems=tile_elems, k_cap=K_CAP
            )
        )
        if len(pend) >= depth:
            fused_count_extract_finish(pend.popleft())
    while pend:
        fused_count_extract_finish(pend.popleft())
    piped = (time.perf_counter() - t0) / iters

    sync_value = n / best
    value = max(sync_value, n / piped)
    print(
        f"sync best {sync_value / 1e9:.1f} GB/s | pipelined x{depth} "
        f"steady-state {n / piped / 1e9:.1f} GB/s over {iters} steps",
        file=sys.stderr,
    )

    # Same-session speed-of-light decomposition (drift-robust: the relay's
    # absolute rates drift 2-3x between sessions, so the self-contained
    # roofline claim is the RATIO of the production step to a pure
    # load+sum Pallas kernel over EXACTLY the same corpus, same fetch
    # pattern — one scalar D2H).  pct_of_pure_load >= ~95 means the scan
    # runs at its own memory pipeline's speed of light and any gap to the
    # HBM roofline is the link's serialized per-transaction cost, not the
    # kernel (docs/PERF.md).
    sol = {}
    if pallas_compute_mode() == "swar" and jax.default_backend() in (
        "tpu", "axon"
    ):
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            TR = 2048
            corpus_rows = n // 4 // lanes32
            NT = corpus_rows // TR

            def load_kernel(tile_ref, out_ref):
                out_ref[:] = jnp.broadcast_to(
                    jnp.sum(tile_ref[:]), (8, 128)
                )

            @jax.jit
            def load_call(x):
                raw = pl.pallas_call(
                    load_kernel,
                    grid=(NT,),
                    in_specs=[
                        pl.BlockSpec(
                            (TR, lanes32), lambda i: (i, 0),
                            memory_space=pltpu.VMEM,
                        )
                    ],
                    out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct(
                        (NT * 8, 128), jnp.int32
                    ),
                )(x)
                return jnp.sum(raw[::8, 0])

            int(load_call(data))  # compile
            load_bytes = NT * TR * lanes32 * 4
            t_load = float("inf")
            for _ in range(max(3, min(iters, 8))):
                t0 = time.perf_counter()
                int(load_call(data))  # result fetch: the only real timing
                t_load = min(t_load, time.perf_counter() - t0)

            # the counts kernel at EXACTLY the load kernel's block geometry
            # (perf_probe's `sol` apparatus): kernel-vs-load with identical
            # tiling is the drift-robust "kernel at its memory pipeline's
            # speed of light" ratio; the full fused step adds the gather +
            # exact-phase-2 + result-buffer work on top
            from monkey_moore_tpu.ops.scan_pallas import tile_counts_pallas

            def counts_step():
                return np.asarray(
                    tile_counts_pallas(pat, data, n, tile_rows=TR)
                )

            counts_step()  # compile
            t_kernel = float("inf")
            for _ in range(max(3, min(iters, 8))):
                t0 = time.perf_counter()
                counts_step()
                t_kernel = min(t_kernel, time.perf_counter() - t0)

            # pipelined pure load — the LINK's end-to-end speed of light:
            # even a kernel that only reads HBM and returns one scalar
            # cannot beat this through the relay's serialized
            # per-transaction path.  The production rate as a percentage
            # of THIS is the self-contained roofline claim.
            lp = deque()
            t0 = time.perf_counter()
            for _ in range(iters):
                lp.append(load_call(data))
                if len(lp) >= depth:
                    int(lp.popleft())
            while lp:
                int(lp.popleft())
            t_load_piped = (time.perf_counter() - t0) / iters

            # scale the load times to the full corpus the fused step scans
            t_load_full = t_load * n / load_bytes
            t_lp_full = t_load_piped * n / load_bytes
            sol = {
                "pure_load_bytes_per_s": load_bytes / t_load,
                "pure_load_pipelined_bytes_per_s": load_bytes / t_load_piped,
                "kernel_over_pure_load": t_kernel / t_load,
                "pct_of_pure_load": 100.0 * t_load / t_kernel,
                "pct_of_pipelined_pure_load": 100.0 * t_lp_full / piped,
                "fused_step_over_pure_load": best / t_load_full,
            }
            print(
                f"pure load {load_bytes / t_load / 1e9:.1f} GB/s sync / "
                f"{load_bytes / t_load_piped / 1e9:.1f} GB/s pipelined | "
                f"counts-kernel/pure-load {t_kernel / t_load:.3f} | "
                f"fused-step/pure-load {best / t_load_full:.3f} | "
                f"piped-fused/piped-load "
                f"{100.0 * t_lp_full / piped:.1f}% (same session)",
                file=sys.stderr,
            )
        except Exception as e:  # decomposition is evidence, not a gate
            print(f"sol decomposition skipped: {e}", file=sys.stderr)

    baseline = reference_baseline()
    kind = jax.devices()[0].device_kind
    roofline = HBM_GBPS.get(kind)
    record = {
        "metric": "relative_search_scan_8bit_bytes_per_s",
        "value": value,
        "unit": "bytes/s",
        "vs_baseline": value / baseline,
    }
    if roofline:
        record["pct_hbm_roofline"] = 100.0 * value / (roofline * 1e9)
    record.update(sol)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main() or 0)
