#!/usr/bin/env python
"""Scaling-efficiency harness: sharded scan throughput vs mesh size.

On real multi-chip hardware this measures bytes/s at 1..N chips (the
BASELINE.json scaling metric).  Without a pod, run it on virtual CPU
devices to validate the collective structure and observe the overhead
curve (virtual devices share one physical CPU, so efficiency numbers on
CPU are *not* meaningful as absolute scaling).

Usage:
  python tools/bench_scaling.py            # default backend, all devices
  python tools/bench_scaling.py --cpu --devices 1 2 4 8 --mb 64
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os

    if args.cpu and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from monkey_moore_tpu.parallel import make_mesh, sharded_candidates
    from monkey_moore_tpu.pattern import compile_pattern

    all_devices = jax.devices()
    sizes = args.devices or sorted(
        {1, 2, len(all_devices) // 2, len(all_devices)} - {0}
    )
    sizes = [s for s in sizes if s <= len(all_devices)]

    n = args.mb * 1024 * 1024
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    pat = compile_pattern("abcde")

    report = {}
    base_rate = None
    for d in sizes:
        mesh = make_mesh(all_devices, n=d)
        sharded_candidates(pat, data, mesh)  # compile + warm
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sharded_candidates(pat, data, mesh)
            best = min(best, time.perf_counter() - t0)
        rate = n / best
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        report[d] = {"bytes_per_s": rate, "efficiency_vs_linear": eff}
        print(f"{d} device(s): {rate / 1e9:6.2f} GB/s  "
              f"efficiency vs linear: {eff * 100:5.1f}%", flush=True)

    out = REPO / "BENCH_SCALING.json"
    out.write_text(json.dumps({
        "data_mb": args.mb,
        "backend": jax.default_backend(),
        "mesh_sizes": report,
    }, indent=2))
    print(f"written: {out}")


if __name__ == "__main__":
    sys.exit(main() or 0)
