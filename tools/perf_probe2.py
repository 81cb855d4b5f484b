#!/usr/bin/env python
"""Probe 2: v2 SWAR kernel (diff-reuse + boundary-only masking) on real TPU."""

import functools
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA_MB = int(os.environ.get("MMTPU_PROBE_MB", "4096"))
ITERS = int(os.environ.get("MMTPU_PROBE_ITERS", "8"))


def emit(name, seconds, nbytes=None):
    rec = {"probe": name, "ms": seconds * 1e3}
    if nbytes:
        rec["gbps"] = nbytes / seconds / 1e9
    print(json.dumps(rec), flush=True)


def timeit(fn, iters=ITERS):
    fn()
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monkey_moore_tpu.ops.scan_pallas import (
        LANES,
        pallas_compute_mode,
        tile_counts_pallas,
    )
    from monkey_moore_tpu.pattern import compile_pattern
    from monkey_moore_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    print(json.dumps({"probe": "device", "kind": dev.device_kind,
                      "mode": pallas_compute_mode()}), flush=True)

    n = DATA_MB * 1024 * 1024
    lanes32 = LANES // 4
    pad_words = 2048 * lanes32
    words = n // 4

    @functools.partial(jax.jit, donate_argnums=0, static_argnames=("m",))
    def fill(buf, key, start, *, m):
        w = jax.random.bits(key, (m,), dtype=jnp.uint32)
        w = jax.lax.bitcast_convert_type(w, jnp.int32)
        return jax.lax.dynamic_update_slice(buf, w, (start,))

    data = jnp.zeros(words + pad_words, dtype=jnp.int32)
    chunk = 64 * 1024 * 1024
    for i, start in enumerate(range(0, words, chunk)):
        m = min(chunk, words - start)
        data = fill(data, jax.random.PRNGKey(i), jnp.int32(start), m=m)
    data = jax.block_until_ready(data)
    data2d = data.reshape(-1, lanes32)

    # sanity: counts must agree with a host check on a slice
    pat = compile_pattern("abcde")
    for tile_rows in (256, 1024, 2048):
        def step():
            counts = tile_counts_pallas(pat, data2d, n, tile_rows=tile_rows)
            return np.asarray(counts)

        emit(f"v2_swar_8bit_tile_rows_{tile_rows}", timeit(step), n)
        c = step()
        print(json.dumps({"probe": f"counts_sum_{tile_rows}",
                          "sum": int(c.sum())}), flush=True)

    # wildcard pattern (multiple bridge-distance groups)
    patw = compile_pattern("ab*de", "*")
    def stepw():
        return np.asarray(
            tile_counts_pallas(patw, data2d, n, tile_rows=1024)
        )
    emit("v2_swar_wildcard_tile_rows_1024", timeit(stepw), n)

    # 16-bit
    pat16 = compile_pattern("abcde", dtype=np.uint16)
    def step16():
        return np.asarray(
            tile_counts_pallas(pat16, data2d, n // 2, tile_rows=1024)
        )
    emit("v2_swar_16bit_tile_rows_1024", timeit(step16), n)

    # longer keyword (more checks)
    pat12 = compile_pattern("abcdefghijkl")
    def step12():
        return np.asarray(
            tile_counts_pallas(pat12, data2d, n, tile_rows=1024)
        )
    emit("v2_swar_L12_tile_rows_1024", timeit(step12), n)


if __name__ == "__main__":
    main()
