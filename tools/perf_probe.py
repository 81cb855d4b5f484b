#!/usr/bin/env python
"""Roofline probe for the SWAR Pallas scan kernel (real TPU, via relay).

Measures, with device->host result fetches forcing real synchronization
(see docs/PERF.md "async mirage"):

  1. relay dispatch floor   — trivial jit fn, scalar fetch
  2. HBM read roofline      — jnp.sum over the resident corpus (one pass)
  3. SWAR tile-count kernel — tile_rows in {256, 512, 1024}
  4. fetch cost             — full counts array vs pre-reduced scalar

Prints one JSON line per measurement; run under nohup and poll the log.
"""

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
    fn()  # compile / warm
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
    print(json.dumps({"probe": "mode", "mode": pallas_compute_mode()}),
          flush=True)

    n = DATA_MB * 1024 * 1024  # corpus bytes (u8 elements)
    pat = compile_pattern("abcde")
    lanes32 = LANES // 4
    max_tile_rows = 1024
    pad_words = max_tile_rows * lanes32
    words = n // 4

    @functools.partial(jax.jit, donate_argnums=0, static_argnames=("m",))
    def fill(buf, key, start, *, m):
        w = jax.random.bits(key, (m,), dtype=jnp.uint32)
        w = jax.lax.bitcast_convert_type(w, jnp.int32)
        return jax.lax.dynamic_update_slice(buf, w, (start,))

    t0 = time.perf_counter()
    data = jnp.zeros(words + pad_words, dtype=jnp.int32)
    chunk = 64 * 1024 * 1024
    for i, start in enumerate(range(0, words, chunk)):
        m = min(chunk, words - start)
        data = fill(data, jax.random.PRNGKey(i), jnp.int32(start), m=m)
    data = jax.block_until_ready(data)
    emit("corpus_fill", time.perf_counter() - t0, n)

    # 1. relay dispatch floor
    one = jnp.ones((8, 128), jnp.int32)
    tiny = jax.jit(lambda x: jnp.sum(x))
    emit("dispatch_floor_scalar_fetch", timeit(lambda: int(tiny(one))))

    # 2. HBM read roofline: one full pass over the corpus, scalar out
    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    emit("hbm_read_sum", timeit(lambda: int(red(data))), n)
    # two passes in one dispatch (dispatch-overhead-free marginal rate)
    red2 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32) + jnp.sum(x[::-1], dtype=jnp.int32))
    emit("hbm_read_sum_x2", timeit(lambda: int(red2(data))), 2 * n)

    # 3. SWAR kernel across tile heights (counts fetched to host each iter)
    for tile_rows in (256, 512, 1024):
        data2d = data.reshape(-1, lanes32)

        def step():
            counts = tile_counts_pallas(
                pat, data2d, n, tile_rows=tile_rows
            )
            return np.asarray(counts)

        emit(f"swar_counts_tile_rows_{tile_rows}", timeit(step), n)

    # 4. fetch cost: full counts array vs pre-reduced scalar
    data2d = data.reshape(-1, lanes32)

    def step_scalar():
        counts = tile_counts_pallas(pat, data2d, n, tile_rows=256)
        return int(jnp.sum(counts))

    emit("swar_counts_scalar_fetch", timeit(step_scalar), n)


if __name__ == "__main__":
    main()
