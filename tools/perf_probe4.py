#!/usr/bin/env python
"""Probe 4: end-to-end step breakdown at 8 GiB (grouped kernel)."""

import functools
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA_MB = int(os.environ.get("MMTPU_PROBE_MB", "8192"))
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

    from monkey_moore_tpu.dense import extract_hot_tiles_device, tile_counts
    from monkey_moore_tpu.ops.scan_pallas import LANES
    from monkey_moore_tpu.pattern import compile_pattern
    from monkey_moore_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    lanes32 = LANES // 4
    tile_rows = 64
    tile_elems = tile_rows * LANES
    n = DATA_MB * 1024 * 1024
    rows_total = (n + tile_elems) // 4 // lanes32
    fill_rows = (64 * 1024 * 1024) // lanes32

    @functools.partial(jax.jit, donate_argnums=0, static_argnames=("m",))
    def fill(buf, key, row0, *, m):
        w = jax.random.bits(key, (m, lanes32), dtype=jnp.uint32)
        w = jax.lax.bitcast_convert_type(w, jnp.int32)
        return jax.lax.dynamic_update_slice(buf, w, (row0, 0))

    data = jnp.zeros((rows_total, lanes32), dtype=jnp.int32)
    corpus_rows = n // 4 // lanes32
    for i, row0 in enumerate(range(0, corpus_rows, fill_rows)):
        m = min(fill_rows, corpus_rows - row0)
        data = fill(data, jax.random.PRNGKey(i), jnp.int32(row0), m=m)
    data = jax.block_until_ready(data)

    pat = compile_pattern("abcde")

    # 1. counts only (kernel + counts D2H)
    def counts_only():
        return tile_counts(pat, data, n, tile_elems=tile_elems)

    emit("counts_only_64k_tiles", timeit(counts_only), n)
    counts = counts_only()
    hot = np.nonzero(counts)[0]
    print(json.dumps({"probe": "hot_tiles", "n": int(len(hot)),
                      "sum": int(counts.sum())}), flush=True)

    # 2. extraction only (batched gather of the hot tiles)
    def extract_only():
        return extract_hot_tiles_device(pat, data, counts, n, tile_elems)

    emit("extract_only", timeit(extract_only))

    # 3. full production step
    def full_step():
        c = tile_counts(pat, data, n, tile_elems=tile_elems)
        if c.any():
            extract_hot_tiles_device(pat, data, c, n, tile_elems)
        return c

    emit("full_step", timeit(full_step), n)

    # 4. pure D2H cost of the counts array size (512 KB at 64 KiB tiles)
    small = jnp.zeros(len(counts), dtype=jnp.int32)
    jax.block_until_ready(small)

    def d2h():
        return np.asarray(small)

    emit("counts_d2h_only", timeit(d2h))

    # 5. scalar fetch floor for reference
    one = jnp.zeros((), jnp.int32) + 1
    jax.block_until_ready(one)

    def scalar():
        return np.asarray(one)

    emit("dispatch_floor_scalar_fetch", timeit(scalar))


if __name__ == "__main__":
    main()
