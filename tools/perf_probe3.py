#!/usr/bin/env python
"""Probe 3: v2 SWAR kernel at 8 GiB resident, large tile_rows sweep."""

import functools
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA_MB = int(os.environ.get("MMTPU_PROBE_MB", "8192"))
ITERS = int(os.environ.get("MMTPU_PROBE_ITERS", "6"))


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
    pad_words = 8192 * lanes32
    words = n // 4

    # allocate the corpus as the kernel's 2-D operand directly — an eager
    # flat->2D reshape would materialize a second corpus-sized buffer
    rows_total = (words + pad_words) // lanes32
    chunk = 64 * 1024 * 1024  # words per fill (256 MiB)
    chunk_rows = chunk // lanes32

    @functools.partial(jax.jit, donate_argnums=0, static_argnames=("m",))
    def fill(buf, key, row0, *, m):
        w = jax.random.bits(key, (m, lanes32), dtype=jnp.uint32)
        w = jax.lax.bitcast_convert_type(w, jnp.int32)
        return jax.lax.dynamic_update_slice(buf, w, (row0, 0))

    data2d = jnp.zeros((rows_total, lanes32), dtype=jnp.int32)
    t0 = time.perf_counter()
    for i, row0 in enumerate(range(0, words // lanes32, chunk_rows)):
        m = min(chunk_rows, words // lanes32 - row0)
        data2d = fill(data2d, jax.random.PRNGKey(i), jnp.int32(row0), m=m)
    data2d = jax.block_until_ready(data2d)
    emit("corpus_fill", time.perf_counter() - t0, n)

    pat = compile_pattern("abcde")
    for tile_rows in (2048, 4096, 8192):
        def step():
            counts = tile_counts_pallas(pat, data2d, n, tile_rows=tile_rows)
            return np.asarray(counts)

        emit(f"v2_8gib_tile_rows_{tile_rows}", timeit(step), n)
        c = step()
        print(json.dumps({"probe": f"counts_sum_{tile_rows}",
                          "sum": int(c.sum())}), flush=True)


if __name__ == "__main__":
    main()
