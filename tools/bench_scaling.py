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

    import tempfile

    from monkey_moore_tpu.config import SearchConfig
    from monkey_moore_tpu.engine import SearchEngine
    from monkey_moore_tpu.parallel import resident

    all_devices = jax.devices()
    sizes = args.devices or sorted(
        {1, 2, len(all_devices) // 2, len(all_devices)} - {0}
    )
    sizes = [s for s in sizes if s <= len(all_devices)]

    n = args.mb * 1024 * 1024
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    # plant 16 evenly spaced matches so the per-shard candidate-balance
    # column shows real load distribution (random data yields none; more
    # would overflow the single-shard hot-tile cap and fall back)
    enc = (np.array([ord(c) for c in "abcde"]) + 11) % 256
    for pos in range(n // 32, n - 5, n // 16):
        data[pos : pos + 5] = enc.astype(np.uint8)
    path = Path(tempfile.mkdtemp()) / "scaling.bin"
    data.tofile(path)

    # The PRODUCTION multi-chip path: SearchEngine over the sharded
    # resident corpus — one collective dispatch per search, corpus
    # uploaded once per mesh.  Structural gates (dispatch count and H2D
    # flat in mesh size) are CI-enforced in tests/test_parallel.py; this
    # harness records the throughput curve.
    # Virtual CPU devices share ONE physical CPU, so bytes/s there measures
    # contention, not hardware scaling — efficiency columns would read as a
    # scaling failure when they are physics.  On CPU the STRUCTURAL columns
    # are the report (per-search dispatch count and repeat-H2D flat in mesh
    # size, per-shard candidate balance, halo bytes crossing ICI); rates
    # and efficiency_vs_linear are emitted only on real multi-chip hardware.
    real_hw = jax.default_backend() not in ("cpu",)
    report = {}
    base_rate = None
    for d in sizes:
        resident.clear_sharded_corpus_cache()
        cfg = SearchConfig(
            file_path=path,
            keyword="abcde",
            devices=all_devices[:d],
            host_latency_threshold_bytes=0,  # measure the mesh, not host
        )
        eng = SearchEngine(cfg)
        eng.run()  # compile + upload + warm
        best = float("inf")
        stats = None
        for _ in range(args.iters):
            e = SearchEngine(cfg)
            t0 = time.perf_counter()
            e.run()
            best = min(best, time.perf_counter() - t0)
            stats = e.last_stats
        rate = n / best
        if base_rate is None:
            base_rate = rate
        row = {
            "device_dispatches": stats.device_dispatches,
            "h2d_bytes_repeat": stats.h2d_bytes,
            "ici_halo_bytes": stats.ici_halo_bytes,
            "per_shard_candidates": stats.per_device_candidates,
        }
        if real_hw:
            row["bytes_per_s"] = rate
            row["efficiency_vs_linear"] = rate / (base_rate * d)
            head = (f"{rate / 1e9:6.2f} GB/s  efficiency vs linear: "
                    f"{row['efficiency_vs_linear'] * 100:5.1f}%  ")
        else:
            head = ""
        report[d] = row
        print(f"{d} device(s): {head}"
              f"dispatches={stats.device_dispatches}, "
              f"repeat h2d={stats.h2d_bytes}, "
              f"ici halo={stats.ici_halo_bytes}, "
              f"per-shard cands={stats.per_device_candidates}", flush=True)

    out = REPO / "BENCH_SCALING.json"
    out.write_text(json.dumps({
        "data_mb": args.mb,
        "backend": jax.default_backend(),
        "primary_metrics": [
            "device_dispatches", "h2d_bytes_repeat", "ici_halo_bytes",
            "per_shard_candidates",
        ],
        "note": (
            "structural scaling evidence: one collective dispatch per "
            "search and zero repeat H2D at every mesh size, halo volume "
            "linear in devices, balanced per-shard candidates.  bytes/s + "
            "efficiency_vs_linear appear ONLY on real multi-chip hardware "
            "(virtual CPU devices share one physical CPU, where such "
            "numbers measure contention, not scaling)"
        ),
        "mesh_sizes": report,
    }, indent=2))
    print(f"written: {out}")


if __name__ == "__main__":
    sys.exit(main() or 0)
