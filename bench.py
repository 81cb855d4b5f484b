#!/usr/bin/env python
"""Headline benchmark: 8-bit relative-search scan throughput on one chip.

Mirrors the reference's benchmark setup (``benchmarks/bench_search.cpp:29,67``:
random data, 5-char keyword "abcde", bytes/s) on device-resident data — the
interactive ROM-exploration workload where the corpus is loaded to HBM once
and searched repeatedly.  The corpus is generated directly in HBM (threefry,
seed 42) and kept resident in the scan kernel's packed SWAR layout; each
timed step runs the full production path — device tile-count prefilter plus
exact host extraction of any hot tiles (fetched device→host on demand).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

``vs_baseline`` compares against the reference C++ core measured on this
host (BASELINE_MEASURED.json; single-thread, its own benchmark's setup).
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

DATA_MB = int(os.environ.get("MMTPU_BENCH_MB", "4096"))
WARMUP = int(os.environ.get("MMTPU_BENCH_WARMUP", "3"))
ITERS = int(os.environ.get("MMTPU_BENCH_ITERS", "15"))


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

    from monkey_moore_tpu.dense import (
        TILE_ELEMS,
        extract_hot_tiles_device,
        tile_counts,
    )
    from monkey_moore_tpu.ops.scan_pallas import pallas_compute_mode
    from monkey_moore_tpu.pattern import compile_pattern

    n = DATA_MB * 1024 * 1024
    assert n % TILE_ELEMS == 0
    pat = compile_pattern("abcde")

    if pallas_compute_mode() == "swar":
        # Generate the corpus directly in HBM as packed random words (the
        # SWAR kernel's operand layout; no host→device transfer — the
        # tunnel used for development uploads at only a few MB/s).
        # Chunked threefry with buffer donation keeps peak HBM at
        # corpus + one chunk (a single 4 GiB jax.random call allocates
        # 8x the output in u32 intermediates).
        words = n // 4
        chunk = min(words, 64 * 1024 * 1024)  # 256 MiB of corpus per fill

        @functools.partial(
            jax.jit, donate_argnums=0, static_argnames=("m",)
        )
        def fill(buf, key, start, *, m):
            w = jax.random.bits(key, (m,), dtype=jnp.uint32)
            w = jax.lax.bitcast_convert_type(w, jnp.int32)
            return jax.lax.dynamic_update_slice(buf, w, (start,))

        data = jnp.zeros(words + TILE_ELEMS // 4, dtype=jnp.int32)
        for i, start in enumerate(range(0, words, chunk)):
            m = min(chunk, words - start)
            data = fill(data, jax.random.PRNGKey(i), jnp.int32(start), m=m)
    else:
        # host-backed path (CPU runs / toolchains with element-dtype
        # kernels): classic host buffer, mirroring the reference bench
        rng = np.random.default_rng(42)
        arr = np.zeros(n + TILE_ELEMS, dtype=np.uint8)
        arr[:n] = rng.integers(0, 256, n, dtype=np.uint8)
        data = jnp.asarray(arr)
    data = jax.block_until_ready(data)

    def step():
        counts = tile_counts(pat, data, n)
        if counts.any():  # full production path incl. exact extraction
            extract_hot_tiles_device(pat, data, counts, n)
        return counts

    step()  # compile
    for _ in range(WARMUP):
        step()

    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)

    value = n / best
    baseline = reference_baseline()
    print(
        json.dumps(
            {
                "metric": "relative_search_scan_8bit_bytes_per_s",
                "value": value,
                "unit": "bytes/s",
                "vs_baseline": value / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
