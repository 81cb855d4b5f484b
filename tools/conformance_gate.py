#!/usr/bin/env python
"""Conformance gate: engine/kernels vs the exact reference oracle.

Runs randomized corpora through every mode × width × endianness × semantics
combination and reports a pass rate (BASELINE.json's conformance metric).
The GREEDY path must equal the oracle on non-pathological corpora; the ALL
path must be a superset; REFERENCE must be identical always.

Usage: python tools/conformance_gate.py [--trials 40] [--seed 7] [--cpu]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from monkey_moore_tpu.config import (
        Endianness,
        MatchSemantics,
        SearchConfig,
    )
    from monkey_moore_tpu.engine import SearchEngine, compute_search_blocks
    from monkey_moore_tpu.oracle import oracle_search
    from monkey_moore_tpu.pattern import compile_pattern
    from monkey_moore_tpu.preview import decode_elements

    rng = np.random.default_rng(args.seed)
    letters = np.arange(97, 123)
    passed = failed = known_divergence = 0
    failures = []

    def _is_true_match(pat, raw_bytes, byte_off, width, endian):
        """Exact signed/masked match predicate at a byte offset."""
        end = byte_off + pat.length * width
        if end > len(raw_bytes):
            return False
        arr = decode_elements(
            raw_bytes[byte_off:end].tobytes(), width, endian
        )
        from monkey_moore_tpu.ops.scan_np import match_positions_np

        return 0 in match_positions_np(pat, arr).tolist()

    with tempfile.TemporaryDirectory() as td:
        for t in range(args.trials):
            width = int(rng.choice([1, 2]))
            endian = rng.choice([Endianness.LITTLE, Endianness.BIG])
            mod = 256 if width == 1 else 65536
            n = int(rng.integers(200, 20000))
            data = rng.integers(0, mod, n)
            kw_len = int(rng.integers(3, 8))
            kw = rng.choice(letters, kw_len).tolist()
            use_wc = rng.random() < 0.4
            if use_wc:
                for i in range(1, kw_len - 1):
                    if rng.random() < 0.3:
                        kw[i] = ord("*")
            keyword = "".join(chr(c) for c in kw)
            for _ in range(int(rng.integers(0, 5))):
                pos = int(rng.integers(0, max(1, n - kw_len)))
                data[pos : pos + kw_len] = (
                    np.array(kw) + int(rng.integers(-30, 30))
                ) % mod

            dtype = np.uint8 if width == 1 else np.uint16
            elems = data.astype(dtype)
            path = Path(td) / f"c{t}.bin"
            order = "<u2" if endian is Endianness.LITTLE else ">u2"
            path.write_bytes(
                elems.astype(order).tobytes() if width == 2 else elems.tobytes()
            )
            block = int(rng.choice([64, 256, 1024, 524288]))
            chunk = int(rng.choice([4096, 65536, 1 << 20]))

            # expected: oracle per logical block per alignment (exact
            # reference behavior)
            pat = compile_pattern(keyword, "*" if use_wc else 0, dtype=dtype)
            file_size = path.stat().st_size
            raw = np.fromfile(path, dtype=np.uint8)
            expected = []
            for off, size in compute_search_blocks(
                file_size, pat.length, width, block
            ):
                blk = raw[off : off + size]
                for a in range(width):
                    cnt = max(0, (size - a) // width)
                    arr = decode_elements(
                        blk[a : a + cnt * width].tobytes(), width, endian
                    )
                    for pos, _ in oracle_search(pat, arr):
                        expected.append(off + pos * width + a)
            expected.sort()

            for semantics in (
                MatchSemantics.GREEDY,
                MatchSemantics.REFERENCE,
                MatchSemantics.ALL,
            ):
                cfg = SearchConfig(
                    file_path=path,
                    keyword=keyword,
                    wildcard="*" if use_wc else 0,
                    element_width=width,
                    endianness=endian,
                    preferred_search_block_size=block,
                    device_chunk_bytes=chunk,
                    semantics=semantics,
                )
                got = [r.offset for r in SearchEngine(cfg).run()]
                if semantics is MatchSemantics.ALL:
                    ok = set(expected) <= set(got)
                else:
                    ok = got == expected
                if not ok and semantics is MatchSemantics.GREEDY:
                    # Known documented divergence: the reference's
                    # bad-character jump can overshoot (miss) a true match;
                    # GREEDY reports it. Verify every extra offset is a
                    # genuine signed match before classifying.
                    extras = sorted(set(got) - set(expected))
                    if set(expected) <= set(got) and all(
                        _is_true_match(pat, raw, b, width, endian)
                        for b in extras
                    ):
                        known_divergence += 1
                        continue
                if ok:
                    passed += 1
                else:
                    failed += 1
                    failures.append(
                        (t, keyword, width, endian.value, block, chunk,
                         semantics.value, expected[:5], got[:5])
                    )

    total = passed + failed + known_divergence
    print(f"conformance: {passed}/{total} passed "
          f"({100.0 * passed / max(1, total):.2f}%), "
          f"{known_divergence} known-divergence "
          f"(reference skip-overshoot missed a true match; GREEDY reports it)")
    for f in failures[:10]:
        print("FAIL:", f)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
