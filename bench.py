#!/usr/bin/env python
"""Headline benchmark: 8-bit relative-search scan throughput on one chip.

Mirrors the reference's benchmark setup (``benchmarks/bench_search.cpp:29,67``:
random data, 5-char keyword "abcde", bytes/s) on device-resident data — the
interactive ROM-exploration workload where the corpus is loaded to HBM once
and searched repeatedly.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

``vs_baseline`` compares against the reference C++ core measured on this
host (BASELINE_MEASURED.json; single-thread, its own benchmark's setup).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

DATA_MB = int(os.environ.get("MMTPU_BENCH_MB", "1024"))
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

    from monkey_moore_tpu.dense import TILE_ELEMS, tile_counts, extract_hot_tiles
    from monkey_moore_tpu.pattern import compile_pattern

    n = DATA_MB * 1024 * 1024
    rng = np.random.default_rng(42)
    arr = np.zeros(n + TILE_ELEMS, dtype=np.uint8)
    arr[:n] = rng.integers(0, 256, n, dtype=np.uint8)
    pat = compile_pattern("abcde")

    data = jax.device_put(jnp.asarray(arr))
    jax.block_until_ready(data)

    def step():
        counts = tile_counts(pat, data, n)
        if counts.any():  # full production path incl. host extraction
            extract_hot_tiles(pat, arr[:n], counts)
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
