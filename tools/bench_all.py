#!/usr/bin/env python
"""Full benchmark matrix mirroring the reference's suites
(``benchmarks/bench_search.cpp:67-104``): 8/16-bit relative search and
wildcard Front/Middle/Back variants, bytes/s on device-resident data.

Writes BENCH_DETAIL.json at the repo root and prints a table with
per-suite speedup vs the reference C++ core measured on this host
(BASELINE_MEASURED.json).

Usage: python tools/bench_all.py [--mb 512] [--iters 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SUITES = [
    ("BM_Search/Relative/8-Bit", "abcde", 0, 1),
    ("BM_Search/Relative/16-Bit", "abcde", 0, 2),
    ("BM_Search/Relative/Wildcard/Front/8-Bit", "*bcde", "*", 1),
    ("BM_Search/Relative/Wildcard/Middle/8-Bit", "ab*de", "*", 1),
    ("BM_Search/Relative/Wildcard/Back/8-Bit", "abcd*", "*", 1),
    ("BM_Search/Relative/Wildcard/Front/16-Bit", "*bcde", "*", 2),
    ("BM_Search/Relative/Wildcard/Middle/16-Bit", "ab*de", "*", 2),
    ("BM_Search/Relative/Wildcard/Back/16-Bit", "abcd*", "*", 2),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--no-sweep", action="store_true",
                    help="skip the 128 KiB..16 MiB buffer-size ladder")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monkey_moore_tpu.dense import TILE_ELEMS, extract_hot_tiles, tile_counts
    from monkey_moore_tpu.pattern import compile_pattern

    baselines = {}
    try:
        blob = json.loads((REPO / "BASELINE_MEASURED.json").read_text())
        for key, values in blob.items():
            if key.startswith("measured"):
                baselines = values
    except Exception:
        pass

    n_bytes = args.mb * 1024 * 1024
    rng = np.random.default_rng(42)
    raw = rng.integers(0, 256, n_bytes, dtype=np.uint8)

    results = {}
    for name, keyword, wildcard, width in SUITES:
        dtype = np.uint8 if width == 1 else np.uint16
        n = n_bytes // width
        data = raw[: n * width].view("<u2" if width == 2 else np.uint8)
        pat = compile_pattern(keyword, wildcard, dtype=dtype)
        arr = np.zeros(
            (-(-n // TILE_ELEMS) + 1) * TILE_ELEMS, dtype=dtype
        )
        arr[:n] = data
        dev = jax.device_put(jnp.asarray(arr))
        jax.block_until_ready(dev)

        def step():
            counts = tile_counts(pat, dev, n)
            if counts.any():
                extract_hot_tiles(pat, arr[:n], counts)

        step()
        for _ in range(args.warmup):
            step()
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            step()
            best = min(best, time.perf_counter() - t0)
        bps = n_bytes / best
        base = baselines.get(name)
        speedup = bps / base if base else None
        results[name] = {
            "bytes_per_s": bps,
            "reference_bytes_per_s": base,
            "speedup": speedup,
        }
        sp = f"{speedup:8.1f}x" if speedup else "      n/a"
        print(f"{name:<45} {bps / 1e9:8.2f} GB/s  vs ref {sp}", flush=True)
        del dev

    # Buffer-size ladder (the reference's Range(128<<10, 16<<20) with
    # RangeMultiplier(4), ``benchmarks/bench_search.cpp:70``) — exposes the
    # fixed per-dispatch overhead knee: small buffers are dispatch-bound,
    # large buffers approach the kernel's HBM-bound rate.
    sweep = {}
    if not args.no_sweep:
        pat = compile_pattern("abcde")
        print()
        for size in [128 << 10 << (2 * i) for i in range(4)] + [16 << 20]:
            n = size
            arr = np.zeros(
                (-(-n // TILE_ELEMS) + 1) * TILE_ELEMS, dtype=np.uint8
            )
            arr[:n] = raw[:n]
            dev = jax.device_put(jnp.asarray(arr))
            jax.block_until_ready(dev)

            def sstep():
                counts = tile_counts(pat, dev, n)
                if counts.any():
                    extract_hot_tiles(pat, arr[:n], counts)

            sstep()
            for _ in range(args.warmup):
                sstep()
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                sstep()
                best = min(best, time.perf_counter() - t0)
            sweep[str(size)] = n / best
            print(f"sweep {size >> 10:>6} KiB {n / best / 1e9:8.2f} GB/s",
                  flush=True)
            del dev

    out = REPO / "BENCH_DETAIL.json"
    out.write_text(json.dumps({
        "data_mb": args.mb,
        "device": str(jax.devices()[0]),
        "suites": results,
        "buffer_size_sweep_8bit": sweep,
    }, indent=2))
    print(f"\nwritten: {out}")


if __name__ == "__main__":
    main()
