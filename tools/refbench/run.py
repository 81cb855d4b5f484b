#!/usr/bin/env python
"""Build + run the reference-baseline benchmark (tools/refbench/refbench.cpp)
over the 8 reference suites, writing BASELINE_MEASURED.json.

This is the harness behind the numbers in BASELINE_MEASURED.json — rerun it
on any host to refresh the baseline the repo's speedup figures compare
against.  ``--sweep`` also measures the reference's 128 KiB → 16 MiB
buffer-size ladder (``benchmarks/bench_search.cpp:70``).

Usage:
    python tools/refbench/run.py [--reference /root/reference]
        [--mb 64] [--reps 5] [--sweep] [-o BASELINE_MEASURED.json]
"""

import argparse
import datetime
import json
import platform
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent

SUITES = [
    ("BM_Search/Relative/8-Bit", 1, "abcde", "."),
    ("BM_Search/Relative/16-Bit", 2, "abcde", "."),
    ("BM_Search/Relative/Wildcard/Front/8-Bit", 1, "*bcde", "*"),
    ("BM_Search/Relative/Wildcard/Middle/8-Bit", 1, "ab*de", "*"),
    ("BM_Search/Relative/Wildcard/Back/8-Bit", 1, "abcd*", "*"),
    ("BM_Search/Relative/Wildcard/Front/16-Bit", 2, "*bcde", "*"),
    ("BM_Search/Relative/Wildcard/Middle/16-Bit", 2, "ab*de", "*"),
    ("BM_Search/Relative/Wildcard/Back/16-Bit", 2, "abcd*", "*"),
]

SWEEP_SIZES = [128 << 10 << (2 * i) for i in range(4)] + [16 << 20]
# 128 KiB, 512 KiB, 2 MiB, 8 MiB, 16 MiB — the reference's Range(128<<10,
# 16<<20) with RangeMultiplier(4)


def build(reference: Path, out_dir: Path) -> Path:
    exe = out_dir / "refbench"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17",
        f"-I{reference / 'include'}",
        str(REPO / "tools/refbench/refbench.cpp"),
        str(reference / "src/core/monkey_moore.cpp"),
        "-o", str(exe),
    ]
    subprocess.run(cmd, check=True)
    return exe


def measure(exe: Path, width: int, kw: str, wc: str, nbytes: int,
            reps: int) -> float:
    out = subprocess.run(
        [str(exe), str(width), kw, wc, str(nbytes), str(reps)],
        capture_output=True, text=True, check=True, timeout=1200,
    )
    best_s = float(out.stdout.split()[0])
    return nbytes / best_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sweep", action="store_true",
                    help="also run the 128 KiB..16 MiB buffer-size ladder")
    ap.add_argument("-o", "--output",
                    default=str(REPO / "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    reference = Path(args.reference)
    if not (reference / "src/core/monkey_moore.cpp").exists():
        print(f"error: reference checkout not found at {reference}",
              file=sys.stderr)
        return 1

    with tempfile.TemporaryDirectory() as td:
        exe = build(reference, Path(td))
        nbytes = args.mb * 1024 * 1024
        measured = {}
        for name, width, kw, wc in SUITES:
            bps = measure(exe, width, kw, wc, nbytes, args.reps)
            measured[name] = round(bps / 1e5) * 1e5
            print(f"{name}: {bps / 1e6:.1f} MB/s", flush=True)

        sweep = {}
        if args.sweep:
            for size in SWEEP_SIZES:
                bps = measure(exe, 1, "abcde", ".", size, args.reps)
                sweep[str(size)] = round(bps / 1e5) * 1e5
                print(f"sweep {size >> 10} KiB: {bps / 1e6:.1f} MB/s",
                      flush=True)

    today = datetime.date.today().isoformat()
    blob = {
        "comment": (
            "Reference (rjricken/monkey-moore) core scan throughput "
            "measured on this machine: g++ -O3 -march=native build of "
            "src/core/monkey_moore.cpp driven by tools/refbench harness "
            f"({args.mb} MiB mt19937(42) random data, keyword 'abcde', "
            f"best of {args.reps}; single thread - the reference's own "
            "benchmark setup, benchmarks/bench_search.cpp:29,67-104). "
            f"Host: {platform.machine()}."
        ),
        f"measured_{today}": measured,
        "unit": "bytes/s",
    }
    if sweep:
        blob[f"sweep_8bit_{today}"] = sweep
    Path(args.output).write_text(json.dumps(blob, indent=2) + "\n")
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
