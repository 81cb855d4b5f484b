#!/usr/bin/env python
"""Conformance gate: engine/kernels vs the exact reference oracle.

Runs randomized corpora through every mode the framework supports —
plain lowercase, **mixed-case** (auto-wildcard + independent case shifts),
interior **wildcards**, **custom character sequences** (including keyword
chars missing from the sequence, the ``std::map::operator[]``
default-insert quirk), **value-scan**, and **degenerate leading-wildcard
patterns** — crossed with width × endianness (including odd 16-bit file
tails) × semantics, and reports a pass rate (BASELINE.json's conformance
metric).  The GREEDY path must equal the oracle on non-pathological
corpora; the ALL path must be a superset; REFERENCE must be identical
always; degenerate patterns must raise ``ValueError`` everywhere the
oracle does.

Usage: python tools/conformance_gate.py [--trials 120] [--seed 7] [--cpu]
"""

import argparse
import string
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MODES = ("plain", "mixed", "wildcard", "seq", "valuescan", "degenerate")
MODE_WEIGHTS = (0.20, 0.15, 0.20, 0.20, 0.15, 0.10)


def _gen_trial(rng, mod):
    """One randomized (mode, keyword/values, char_seq, wildcard) draw."""
    mode = rng.choice(MODES, p=MODE_WEIGHTS)
    lower = list(string.ascii_lowercase)
    seq = ""
    values = ()
    wildcard = 0
    if mode == "plain":
        kw_len = int(rng.integers(3, 9))
        kw = "".join(rng.choice(lower, kw_len))
        if rng.random() < 0.2:  # periodic patterns stress the skip table
            kw = (kw[:2] * 4)[:kw_len]
    elif mode == "mixed":
        kw_len = int(rng.integers(3, 9))
        kw = "".join(
            c.upper() if rng.random() < 0.5 else c
            for c in rng.choice(lower, kw_len)
        )
        # mixed case needs >= 1 of each to exercise opposing shifts
        if kw.islower() or kw.isupper():
            kw = kw[0].swapcase() + kw[1:]
    elif mode == "wildcard":
        kw_len = int(rng.integers(4, 9))
        chars = list(rng.choice(lower, kw_len))
        for i in range(1, kw_len - 1):
            if rng.random() < 0.3:
                chars[i] = "*"
        kw = "".join(chars)
        wildcard = "*"
    elif mode == "seq":
        pool = list(string.ascii_lowercase + string.digits + "!?._-")
        seq_len = int(rng.integers(5, 21))
        seq = "".join(
            rng.choice(pool, size=seq_len, replace=False).tolist()
        )
        kw_len = int(rng.integers(3, 9))
        kw = "".join(rng.choice(list(seq), kw_len))
        if rng.random() < 0.25:
            # a keyword char absent from the sequence: the reference's
            # std::map::operator[] default-inserts index 0 for it
            missing = next(c for c in pool if c not in seq)
            pos = int(rng.integers(0, kw_len))
            kw = kw[:pos] + missing + kw[pos + 1 :]
        if rng.random() < 0.4:
            wildcard = "*"
            pos = int(rng.integers(1, max(2, kw_len - 1)))
            kw = kw[:pos] + "*" + kw[pos + 1 :]
    elif mode == "valuescan":
        v_len = int(rng.integers(3, 9))
        values = tuple(int(v) for v in rng.integers(0, mod, v_len))
        kw = ""
    else:  # degenerate: all literals inside the leading-wildcard span
        wildcard = "*"
        core = "".join(rng.choice(lower, int(rng.integers(1, 3))))
        kw = "*" * (len(core) + int(rng.integers(0, 2))) + core
    return mode, kw, seq, values, wildcard


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=120)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", type=Path, default=None,
                    help="write the gate result as a JSON artifact (used "
                         "for the per-round on-TPU record, "
                         "CONFORMANCE_TPU.json)")
    ap.add_argument("--multi-trials", type=int, default=None,
                    help="multi-keyword batch trials (MultiSearcher vs "
                         "per-keyword engines; default trials//4)")
    args = ap.parse_args()

    import os

    if args.cpu:
        if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""
        ):
            # virtual devices so the gate can fuzz the MESH route too
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

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
    passed = failed = known_divergence = 0
    failures = []
    mode_counts: dict = {}

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
            mode, keyword, seq, values, wildcard = _gen_trial(rng, mod)
            mode_counts[mode] = mode_counts.get(mode, 0) + 1
            dtype = np.uint8 if width == 1 else np.uint16

            # compile first so planting can use the pattern's own tables
            try:
                if values:
                    pat = compile_pattern(
                        reference_values=list(values), dtype=dtype
                    )
                else:
                    pat = compile_pattern(
                        keyword, wildcard, char_seq=seq, dtype=dtype
                    )
            except ValueError:
                # library rejects at compile time; the engine must too
                cfg = SearchConfig(
                    file_path=Path(td) / "none.bin", keyword=keyword,
                    wildcard=wildcard, custom_char_seq=seq,
                    element_width=width,
                )
                (Path(td) / "none.bin").write_bytes(b"\0" * 64)
                try:
                    SearchEngine(cfg).run()
                    failed += 1
                    failures.append((t, mode, keyword, "no-raise-compile"))
                except ValueError:
                    passed += 1
                continue

            # plant approximate matches (shifted encodings; random case
            # shifts for mixed-case, table indices for custom sequences)
            k_len = pat.length
            for _ in range(int(rng.integers(0, 5))):
                pos = int(rng.integers(0, max(1, n - k_len)))
                shift = int(rng.integers(-30, 30))
                if values:
                    data[pos : pos + k_len] = np.array(values)
                elif seq:
                    enc = [
                        (pat.char_index.get(c, 0) + shift) % mod
                        for c in keyword
                    ]
                    data[pos : pos + k_len] = enc
                elif mode == "mixed":
                    shift2 = (
                        shift if rng.random() < 0.5
                        else int(rng.integers(-30, 30))
                    )
                    enc = [
                        (ord(c) + (shift if c.islower() else shift2)) % mod
                        for c in keyword
                    ]
                    data[pos : pos + k_len] = enc
                else:
                    enc = [(ord(c) + shift) % mod for c in keyword]
                    data[pos : pos + k_len] = enc

            path = Path(td) / f"c{t}.bin"
            order = "<u2" if endian is Endianness.LITTLE else ">u2"
            blob = (
                data.astype(dtype).astype(order).tobytes()
                if width == 2
                else data.astype(dtype).tobytes()
            )
            if width == 2 and rng.random() < 0.3:
                blob += bytes([int(rng.integers(0, 256))])  # odd tail
            path.write_bytes(blob)
            block = int(rng.choice([64, 256, 1024, 524288]))
            chunk = int(rng.choice([4096, 65536, 1 << 20]))

            def mk_cfg(semantics):
                return SearchConfig(
                    file_path=path,
                    is_relative_search=not values,
                    keyword=keyword,
                    wildcard=wildcard,
                    custom_char_seq=seq,
                    reference_values=list(values),
                    element_width=width,
                    endianness=endian,
                    preferred_search_block_size=block,
                    device_chunk_bytes=chunk,
                    semantics=semantics,
                    # fuzz ALL THREE engine routes: t%3==0 the host
                    # latency path (the default for these file sizes),
                    # t%3==1 the forced device scan, t%3==2 the mesh path
                    # over a random virtual-device count
                    host_latency_threshold_bytes=(
                        1 << 40 if t % 3 == 0 else 0
                    ),
                    devices=(
                        list(jax.devices()[: int(rng.choice([2, 4, 8]))])
                        if t % 3 == 2 and len(jax.devices()) >= 2
                        else None
                    ),
                )

            # expected: oracle per logical block per alignment (exact
            # reference behavior); degenerate patterns raise here
            file_size = path.stat().st_size
            raw = np.fromfile(path, dtype=np.uint8)
            expected = []
            degenerate = False
            for off, size in compute_search_blocks(
                file_size, pat.length, width, block
            ):
                blk = raw[off : off + size]
                for a in range(width):
                    cnt = max(0, (size - a) // width)
                    arr = decode_elements(
                        blk[a : a + cnt * width].tobytes(), width, endian
                    )
                    try:
                        walked = oracle_search(pat, arr)
                    except ValueError:
                        degenerate = True
                        break
                    for pos, _ in walked:
                        expected.append(off + pos * width + a)
                if degenerate:
                    break
            expected.sort()

            if degenerate:
                # the oracle refuses (advance <= 0 would not terminate in
                # the reference); REFERENCE semantics must raise identically
                try:
                    SearchEngine(mk_cfg(MatchSemantics.REFERENCE)).run()
                    failed += 1
                    failures.append((t, mode, keyword, "no-raise-run"))
                except ValueError:
                    passed += 1
                continue

            for semantics in (
                MatchSemantics.GREEDY,
                MatchSemantics.REFERENCE,
                MatchSemantics.ALL,
            ):
                got = [
                    r.offset for r in SearchEngine(mk_cfg(semantics)).run()
                ]
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
                        (t, mode, keyword or values, width, endian.value,
                         block, chunk, semantics.value, expected[:5],
                         got[:5])
                    )

    # ------------------------------------------------------------------
    # Multi-keyword batch trials: MultiSearcher (the K-scaled fused batch
    # kernel / per-keyword fallback) must return, per keyword, EXACTLY the
    # offsets the single-keyword engine returns under an identical config
    # — the single path is itself oracle-gated above, so equality here
    # transitively conforms the batch path.
    n_multi = (
        args.multi_trials
        if args.multi_trials is not None
        else args.trials // 4
    )
    multi_checked = 0
    with tempfile.TemporaryDirectory() as td:
        from monkey_moore_tpu.multi import MultiSearcher

        lower = list(string.ascii_lowercase)
        for t in range(n_multi):
            width = int(rng.integers(1, 3))
            endian = rng.choice([Endianness.LITTLE, Endianness.BIG])
            mod = 256 if width == 1 else 65536
            dtype = np.uint8 if width == 1 else np.uint16
            n = int(rng.integers(500, 30000))
            data = rng.integers(0, mod, n)
            k = int(rng.integers(2, 5))
            specs = []
            for _ in range(k):
                mode = rng.choice(["plain", "wildcard", "value"],
                                  p=[0.5, 0.3, 0.2])
                if mode == "value":
                    specs.append({
                        "reference_values": [
                            int(v) for v in rng.integers(0, mod, 4)
                        ]
                    })
                else:
                    kw_len = int(rng.integers(3, 8))
                    chars = list(rng.choice(lower, kw_len))
                    wc = 0
                    if mode == "wildcard" and kw_len >= 4:
                        chars[int(rng.integers(1, kw_len - 1))] = "*"
                        wc = "*"
                    specs.append(
                        {"keyword": "".join(chars), "wildcard": wc}
                        if wc else "".join(chars)
                    )
            # plant a few shifted matches for the keyword specs
            for spec in specs:
                kw = spec if isinstance(spec, str) else spec.get(
                    "keyword", "")
                if not kw:
                    continue
                for _ in range(int(rng.integers(0, 3))):
                    pos = int(rng.integers(0, max(1, n - len(kw))))
                    shift = int(rng.integers(-20, 20))
                    data[pos : pos + len(kw)] = [
                        (ord(c) + shift) % mod if c != "*"
                        else int(rng.integers(0, mod))
                        for c in kw
                    ]
            path = Path(td) / f"m{t}.bin"
            order = "<u2" if endian is Endianness.LITTLE else ">u2"
            path.write_bytes(
                data.astype(dtype).astype(order).tobytes()
                if width == 2 else data.astype(dtype).tobytes()
            )
            common = dict(
                element_width=width, endianness=endian,
                preferred_search_block_size=int(
                    rng.choice([1024, 524288])
                ),
                device_chunk_bytes=int(rng.choice([8192, 1 << 20])),
            )
            ms = MultiSearcher(
                path,
                devices=(
                    list(jax.devices()[: int(rng.choice([2, 4]))])
                    if t % 3 == 2 and len(jax.devices()) >= 2
                    else None
                ),
                **common,
            )
            groups = ms.search(specs)
            for spec, group in zip(specs, groups):
                kwargs = (
                    {"keyword": spec} if isinstance(spec, str)
                    else dict(spec)
                )
                cfg = SearchConfig(
                    file_path=path,
                    is_relative_search="reference_values" not in kwargs,
                    keyword=kwargs.get("keyword", ""),
                    wildcard=kwargs.get("wildcard", 0) or 0,
                    reference_values=list(
                        kwargs.get("reference_values", ())
                    ),
                    host_latency_threshold_bytes=(
                        1 << 40 if t % 3 == 0 else 0
                    ),
                    **common,
                )
                want = [r.offset for r in SearchEngine(cfg).run()]
                got = [r.offset for r in group]
                multi_checked += 1
                if got == want:
                    passed += 1
                else:
                    failed += 1
                    failures.append(
                        ("multi", t, spec, width, endian.value,
                         want[:5], got[:5])
                    )

    total = passed + failed + known_divergence
    modes_str = " ".join(f"{m}={c}" for m, c in sorted(mode_counts.items()))
    if multi_checked:
        modes_str += f" multi={multi_checked}"
    print(f"conformance: {passed}/{total} passed "
          f"({100.0 * passed / max(1, total):.2f}%), "
          f"{known_divergence} known-divergence "
          f"(reference skip-overshoot missed a true match; GREEDY reports "
          f"it) [{modes_str}]")
    for f in failures[:10]:
        print("FAIL:", f)

    if args.json:
        import datetime
        import json

        from monkey_moore_tpu.ops.scan_pallas import pallas_compute_mode

        dev0 = jax.devices()[0]
        artifact = {
            "date": datetime.date.today().isoformat(),
            "backend": jax.default_backend(),
            "device_kind": dev0.device_kind,
            "n_devices": len(jax.devices()),
            "kernel_mode": pallas_compute_mode(),
            "trials": args.trials,
            "seed": args.seed,
            "checks_passed": passed,
            "checks_failed": failed,
            "known_divergence": known_divergence,
            "pass_rate_pct": 100.0 * passed / max(1, total),
            "mode_counts": mode_counts,
            "routes": "host / forced-device / mesh (t%3 rotation; mesh "
                      "falls back to forced-device when <2 devices)",
            "failures": [repr(f) for f in failures[:10]],
        }
        args.json.write_text(json.dumps(artifact, indent=2) + "\n")
        print(f"written: {args.json}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
