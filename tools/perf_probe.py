#!/usr/bin/env python
"""Roofline / breakdown probe for the SWAR Pallas scan kernel (real TPU).

Every timing fetches a result device->host to force real synchronization
(see docs/PERF.md "async mirage" — `block_until_ready` alone can return
early on the axon relay).  Run under ``nohup`` and poll the log; never
hard-kill a JAX process mid-operation (it poisons the relay for ~10 min).

Stages (``--stage``, comma-separated; default ``floor,roofline,kernel``):

  floor     relay dispatch floor (trivial jit fn, scalar fetch) and the
            pure D2H cost of a counts-sized array
  roofline  HBM read speed-of-light: jnp.sum over the resident corpus,
            single-pass and two-passes-in-one-dispatch (marginal rate)
  kernel    SWAR tile-count kernel across --tile-rows heights, counts
            fetched each iteration (the production phase-1 measurement)
  variants  wildcard ("ab*de"), 16-bit, and 12-char-keyword kernel rates
  e2e       two-dispatch step breakdown at the engine's 64 KiB count
            tiles: counts-only, hot-tile extraction only, full step
  fused     the production fused step (ONE dispatch + ONE D2H transaction,
            dense.fused_count_extract) at 8 KiB gather tiles, vs the
            counts-only and two-dispatch compositions on the same corpus
  sol       speed-of-light ratio: production counts kernel vs a pure
            load+sum kernel with identical block geometry (robust to the
            relay's 2x between-session drift)
  ab        same-session A/B sweeps: word-compare vs v2 counts kernel
            (MMTPU_WORDCMP), and gather modes (dma/block/XLA take) under
            the fused 8-bit wildcard step (the high-hot-tile regime)

Examples (the measurements in docs/PERF.md):

  nohup python tools/perf_probe.py --mb 4096 > /tmp/probe.log &
  nohup python tools/perf_probe.py --mb 8192 --stage kernel,e2e \
      --tile-rows 2048 > /tmp/probe8g.log &
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def emit(name, seconds, nbytes=None, **extra):
    rec = {"probe": name, "ms": seconds * 1e3}
    if nbytes:
        rec["gbps"] = nbytes / seconds / 1e9
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def make_timeit(iters):
    def timeit(fn):
        fn()  # compile / warm
        fn()
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    return timeit


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mb", type=int, default=4096, help="corpus MiB (u8)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--stage", default="floor,roofline,kernel",
        help="comma list: floor,roofline,kernel,variants,e2e,fused,sol,ab,all",
    )
    ap.add_argument(
        "--tile-rows", default="256,1024,2048",
        help="comma list of kernel tile heights for the kernel stage",
    )
    args = ap.parse_args()
    stages = set(args.stage.split(","))
    if "all" in stages:
        stages = {
            "floor", "roofline", "kernel", "variants", "e2e", "fused",
            "sol", "ab",
        }
    timeit = make_timeit(args.iters)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monkey_moore_tpu.dense import extract_hot_tiles_device, tile_counts
    from monkey_moore_tpu.ops.scan_pallas import (
        LANES,
        pallas_compute_mode,
        tile_counts_pallas,
    )
    from monkey_moore_tpu.pattern import compile_pattern
    from monkey_moore_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "probe": "device",
                "kind": dev.device_kind,
                "mode": pallas_compute_mode(),
                "mb": args.mb,
            }
        ),
        flush=True,
    )

    n = args.mb * 1024 * 1024
    lanes32 = LANES // 4
    words = n // 4
    tile_rows_list = [int(t) for t in args.tile_rows.split(",")]
    pad_rows = max(tile_rows_list + [2048])

    # Allocate the corpus directly as the kernel's 2-D packed operand — an
    # eager flat->2D reshape of a device array would materialize a second
    # corpus-sized buffer (OOM at 8 GiB on a 16 GiB chip).  Chunked threefry
    # fill with buffer donation keeps peak HBM at corpus + one 256 MiB chunk.
    # halo for the largest coarse block, then rounded so 8-row fine tiles
    # stay divisible by the 256-tile dispatch group (rows ≡ 8 mod 2048):
    # an indivisible fine-tile count silently degrades grouping ~5x
    rows_total = words // lanes32 + pad_rows
    rows_total += (8 - rows_total) % 2048
    chunk_rows = (64 * 1024 * 1024) // lanes32  # 256 MiB per fill

    @functools.partial(jax.jit, donate_argnums=0, static_argnames=("m",))
    def fill(buf, key, row0, *, m):
        w = jax.random.bits(key, (m, lanes32), dtype=jnp.uint32)
        w = jax.lax.bitcast_convert_type(w, jnp.int32)
        return jax.lax.dynamic_update_slice(buf, w, (row0, 0))

    corpus_rows = words // lanes32
    data2d = jnp.zeros((rows_total, lanes32), dtype=jnp.int32)
    t0 = time.perf_counter()
    for i, row0 in enumerate(range(0, corpus_rows, chunk_rows)):
        m = min(chunk_rows, corpus_rows - row0)
        data2d = fill(data2d, jax.random.PRNGKey(i), jnp.int32(row0), m=m)
    data2d = jax.block_until_ready(data2d)
    emit("corpus_fill", time.perf_counter() - t0, n)

    pat = compile_pattern("abcde")  # the reference benchmark keyword

    if "floor" in stages:
        one = jnp.ones((8, 128), jnp.int32)
        tiny = jax.jit(lambda x: jnp.sum(x))
        emit("dispatch_floor_scalar_fetch", timeit(lambda: int(tiny(one))))
        counts_sized = jnp.zeros(n // (64 * 1024), dtype=jnp.int32)
        counts_sized = jax.block_until_ready(counts_sized)
        emit("counts_d2h_only", timeit(lambda: np.asarray(counts_sized)))

    if "roofline" in stages:
        red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        emit("hbm_read_sum", timeit(lambda: int(red(data2d))), n)
        # two passes in one dispatch (dispatch-overhead-free marginal rate);
        # the reverse forces XLA to actually read twice, but it materializes
        # a corpus-sized temp — only feasible when half the HBM is free
        red2 = jax.jit(
            lambda x: jnp.sum(x, dtype=jnp.int32)
            + jnp.sum(x[::-1], dtype=jnp.int32)
        )
        try:
            emit("hbm_read_sum_x2", timeit(lambda: int(red2(data2d))), 2 * n)
        except Exception as e:  # OOM at large corpora — skip, not fatal
            print(
                json.dumps(
                    {"probe": "hbm_read_sum_x2", "skipped": str(e)[:120]}
                ),
                flush=True,
            )

    if "kernel" in stages:
        for tile_rows in tile_rows_list:
            def step(tr=tile_rows):
                return np.asarray(
                    tile_counts_pallas(pat, data2d, n, tile_rows=tr)
                )

            emit(f"swar_counts_tile_rows_{tile_rows}", timeit(step), n)
            c = step()
            print(
                json.dumps(
                    {"probe": f"counts_sum_{tile_rows}", "sum": int(c.sum())}
                ),
                flush=True,
            )

    if "variants" in stages:
        cases = [
            ("wildcard_ab*de", compile_pattern("ab*de", "*"), n),
            ("16bit", compile_pattern("abcde", dtype=np.uint16), n // 2),
            ("L12", compile_pattern("abcdefghijkl"), n),
        ]
        for name, p, valid in cases:
            def step(p=p, valid=valid):
                return np.asarray(
                    tile_counts_pallas(p, data2d, valid, tile_rows=1024)
                )

            emit(f"swar_{name}_tile_rows_1024", timeit(step), n)

    if "e2e" in stages:
        # the engine/bench configuration: 64 KiB count tiles, auto-grouped
        # into 2 MiB dispatch blocks, hot tiles fetched in one batched gather
        tile_elems = 64 * LANES

        def counts_only():
            return tile_counts(pat, data2d, n, tile_elems=tile_elems)

        emit("e2e_counts_only_64k_tiles", timeit(counts_only), n)
        counts = counts_only()
        hot = np.nonzero(counts)[0]
        print(
            json.dumps(
                {
                    "probe": "hot_tiles",
                    "n": int(len(hot)),
                    "sum": int(counts.sum()),
                }
            ),
            flush=True,
        )
        if len(hot):
            emit(
                "e2e_extract_only",
                timeit(
                    lambda: extract_hot_tiles_device(
                        pat, data2d, counts, n, tile_elems
                    )
                ),
            )

        def full_step():
            c = tile_counts(pat, data2d, n, tile_elems=tile_elems)
            if c.any():
                extract_hot_tiles_device(pat, data2d, c, n, tile_elems)
            return c

        emit("e2e_full_step", timeit(full_step), n)

    if "fused" in stages:
        from monkey_moore_tpu.dense import fused_count_extract

        for kw, te in (("abcde", 8 * LANES), ("ab*de", 8 * LANES)):
            p = compile_pattern(kw, "*" if "*" in kw else 0)

            def fstep(p=p, te=te):
                _, _, info = fused_count_extract(
                    pat if p is None else p, data2d, n, tile_elems=te
                )
                return info

            info = fstep()
            emit(
                f"fused_step_{kw.replace('*', 'W')}", timeit(fstep), n,
                hot=info.hot_tiles,
            )

    if "sol" in stages:
        # Speed-of-light A/B: a pure load+sum Pallas kernel with EXACTLY
        # the production block geometry, vs the production counts kernel,
        # same session.  The relay's absolute rates drift 2x between
        # sessions (floor 24-55 ms observed), so the roofline claim is the
        # RATIO: kernel_time / pure_load_time -> how close the scan runs
        # to its own memory pipeline's speed of light.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TR = 2048
        NT = (data2d.shape[0] - pad_rows) // TR

        def load_kernel(tile_ref, out_ref):
            out_ref[:] = jnp.broadcast_to(jnp.sum(tile_ref[:]), (8, 128))

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
                out_shape=jax.ShapeDtypeStruct((NT * 8, 128), jnp.int32),
            )(x)
            return jnp.sum(raw[::8, 0])

        t_load = timeit(lambda: int(load_call(data2d)))
        emit("sol_pure_load_sum", t_load, n)
        t_kernel = timeit(
            lambda: np.asarray(tile_counts_pallas(pat, data2d, n,
                                                  tile_rows=TR))
        )
        emit("sol_counts_kernel", t_kernel, n)
        print(
            json.dumps(
                {
                    "probe": "sol_ratio",
                    "kernel_over_pure_load": t_kernel / t_load,
                    "note": "1.0 = scan at its memory pipeline's "
                            "speed of light",
                }
            ),
            flush=True,
        )

    if "ab" in stages:
        # In-process A/B of the kernel formulations and gather modes (the
        # relay drifts 10-20% between sessions — only same-session
        # comparisons are meaningful, docs/PERF.md).
        import os

        from monkey_moore_tpu.dense import fused_count_extract
        from monkey_moore_tpu.ops import scan_pallas as sp

        # (a) word-compare vs v2 xor/or/popcount counts kernel
        for label, env in (("wordcmp", None), ("v2", "0")):
            if env is None:
                os.environ.pop("MMTPU_WORDCMP", None)
            else:
                os.environ["MMTPU_WORDCMP"] = env

            def kstep():
                return np.asarray(
                    tile_counts_pallas(pat, data2d, n, tile_rows=2048)
                )

            emit(f"ab_kernel_{label}_8bit", timeit(kstep), n)
            p16 = compile_pattern("abcde", dtype=np.uint16)

            def kstep16():
                return np.asarray(
                    tile_counts_pallas(p16, data2d, n // 2, tile_rows=2048)
                )

            emit(f"ab_kernel_{label}_16bit", timeit(kstep16), n)
        os.environ.pop("MMTPU_WORDCMP", None)

        # (b) gather modes under the fused wildcard step (high hot-tile
        # count: the 8-bit wildcard regime that collapsed in round 2)
        pw = compile_pattern("ab*de", "*")
        detected = sp.pallas_gather_mode()
        emit_modes = ["dma", "block", None]
        for gm in emit_modes:
            if gm is not None and detected is None:
                continue
            sp._PALLAS_PROBE["gather_mode"] = gm

            def gstep():
                _, _, info = fused_count_extract(
                    pw, data2d, n, tile_elems=8 * LANES
                )
                return info

            try:
                info = gstep()
                emit(
                    f"ab_gather_{gm or 'take'}_fused_wildcard",
                    timeit(gstep), n, hot=info.hot_tiles,
                    fallback=info.fallback,
                )
            except Exception as e:
                print(
                    json.dumps(
                        {
                            "probe": f"ab_gather_{gm or 'take'}",
                            "error": str(e)[:200],
                        }
                    ),
                    flush=True,
                )
        sp._PALLAS_PROBE["gather_mode"] = detected


if __name__ == "__main__":
    main()
