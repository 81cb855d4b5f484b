"""Native C++ walker tests: builds the shared library and fuzzes it against
the Python oracle across all modes."""

import numpy as np
import pytest

from monkey_moore_tpu.native import build_library, native_available, native_walk
from monkey_moore_tpu.oracle import oracle_search, reference_walk
from monkey_moore_tpu.pattern import compile_pattern

pytestmark = pytest.mark.skipif(
    build_library() is None, reason="g++ unavailable"
)


class TestNativeWalker:
    def test_available(self):
        assert native_available()

    @pytest.mark.parametrize("width", [1, 2])
    def test_fuzz_simple_vs_oracle(self, rng, width):
        dtype = np.uint8 if width == 1 else np.uint16
        mod = 256 if width == 1 else 65536
        letters = np.arange(97, 123)
        for _ in range(40):
            n = int(rng.integers(10, 3000))
            data = rng.integers(0, mod, n)
            kw = rng.choice(letters, int(rng.integers(2, 8))).tolist()
            for _ in range(int(rng.integers(0, 4))):
                pos = int(rng.integers(0, max(1, n - len(kw))))
                data[pos : pos + len(kw)] = (
                    np.array(kw) + int(rng.integers(-30, 30))
                ) % mod
            pat = compile_pattern(kw, dtype=dtype)
            arr = data.astype(dtype)
            native = native_walk(pat, arr)
            oracle = [o for o, _ in oracle_search(pat, arr)]
            assert native.tolist() == oracle

    @pytest.mark.parametrize("width", [1, 2])
    def test_fuzz_wildcard_vs_oracle(self, rng, width):
        dtype = np.uint8 if width == 1 else np.uint16
        mod = 256 if width == 1 else 65536
        letters = np.arange(97, 123)
        for _ in range(40):
            n = int(rng.integers(10, 2000))
            data = rng.integers(0, mod, n)
            kw = rng.choice(letters, int(rng.integers(3, 8))).tolist()
            for i in range(1, len(kw) - 1):
                if rng.random() < 0.3:
                    kw[i] = ord("*")
            pat = compile_pattern(kw, "*", dtype=dtype)
            if pat.advance <= 0:
                continue
            for _ in range(int(rng.integers(0, 4))):
                pos = int(rng.integers(0, max(1, n - len(kw))))
                data[pos : pos + len(kw)] = (
                    np.array(kw) + int(rng.integers(-30, 30))
                ) % mod
            arr = data.astype(dtype)
            native = native_walk(pat, arr)
            oracle = [o for o, _ in oracle_search(pat, arr)]
            assert native.tolist() == oracle

    def test_skip_overshoot_parity(self):
        # the native walker must reproduce the reference's missed match
        data = np.array([10, 6, 7, 8, 9, 10, 0, 0, 0, 0], dtype=np.uint8)
        pat = compile_pattern("abcde")
        assert native_walk(pat, data).tolist() == []

    def test_overflow_retry(self):
        # >65536 matches force the exact-size retry path
        data = np.tile(np.array([97, 98], dtype=np.uint8), 80000)
        pat = compile_pattern("abab")
        native = native_walk(pat, data)
        oracle = [o for o, _ in oracle_search(pat, data)]
        assert native.tolist() == oracle
        assert len(native) > 65536 // 2

    def test_degenerate_advance_does_not_hang(self):
        # keyword "**a": all literals sit inside the leading-wildcard span,
        # advance = L-1-leading = 0 — the reference infinite-loops on the
        # first match.  The walker must refuse (return -1) and reference_walk
        # must surface the oracle's ValueError instead of spinning in C.
        data = np.full(64, ord("a"), dtype=np.uint8)  # every window matches
        pat = compile_pattern("**a", "*")
        assert pat.advance <= 0
        assert native_walk(pat, data) is None  # refused, not hung
        with pytest.raises(ValueError, match="advance"):
            reference_walk(pat, data)

    def test_length_one_does_not_hang(self):
        data = np.full(64, ord("a"), dtype=np.uint8)
        pat = compile_pattern("a")
        assert native_walk(pat, data) is None
        with pytest.raises(ValueError):
            reference_walk(pat, data)

    def test_reference_walk_returns_maps(self):
        data = (np.array([ord(c) for c in "xxcatchyy"]) + 3).astype(np.uint8)
        pat = compile_pattern("catch")
        results = reference_walk(pat, data)
        assert results == oracle_search(pat, data)
        assert results[0][1][ord("a")] == ord("a") + 3


class TestNativeDenseScan:
    """The C dense scanner (``mm_dense_scan_*``) — the host latency path's
    hot loop — must agree with the NumPy matcher exactly (ALL matching
    window starts, ascending) across widths, modes, and check shapes."""

    @pytest.mark.parametrize("width", [1, 2])
    def test_fuzz_vs_numpy(self, rng, width):
        from monkey_moore_tpu.native import native_dense_scan
        from monkey_moore_tpu.ops.scan_np import match_positions_np

        dtype = np.uint8 if width == 1 else np.uint16
        mod = 256 if width == 1 else 65536
        letters = np.arange(97, 123)
        for trial in range(60):
            n = int(rng.integers(6, 5000))
            data = rng.integers(0, mod, n)
            kw = rng.choice(letters, int(rng.integers(2, 10))).tolist()
            use_wc = len(kw) >= 3 and rng.random() < 0.4
            if use_wc:
                for i in range(1, len(kw) - 1):
                    if rng.random() < 0.3:
                        kw[i] = ord("*")
            for _ in range(int(rng.integers(0, 5))):
                pos = int(rng.integers(0, max(1, n - len(kw))))
                data[pos : pos + len(kw)] = (
                    np.array(kw) + int(rng.integers(-40, 40))
                ) % mod
            pat = compile_pattern(kw, "*" if use_wc else 0, dtype=dtype)
            arr = data.astype(dtype)
            got = native_dense_scan(pat, arr)
            assert got is not None
            want = match_positions_np(pat, arr)
            assert got.tolist() == want.tolist(), (kw, width, trial)

    def test_value_scan_signed_mode(self, rng):
        """Signed compare must NOT wrap: a diff of -1 is not a diff of
        +255 (the wrap-compare primary pass is only a prefilter)."""
        from monkey_moore_tpu.native import native_dense_scan
        from monkey_moore_tpu.ops.scan_np import match_positions_np

        pat = compile_pattern(reference_values=[10, 9, 8])  # diffs -1, -1
        assert pat.signed_compare
        data = np.array([10, 9, 8, 0, 255, 254, 253, 10, 9, 8],
                        dtype=np.uint8)
        # 255,254,253 at offset 4 is itself descending-by-1 (value scan is
        # relative), so three true matches
        got = native_dense_scan(pat, data)
        want = match_positions_np(pat, data)
        assert got.tolist() == want.tolist() == [0, 4, 7]
        # wrap/signed distinction: expected diff +255 (values [0, 255]);
        # data diff -1 wraps to 255 so the wrap-compare primary pass admits
        # it, but the exact signed verify must reject it
        pat2 = compile_pattern(reference_values=[0, 255, 0])
        assert pat2.signed_compare
        data2 = np.array([3, 2, 3, 0, 255, 0], dtype=np.uint8)
        got2 = native_dense_scan(pat2, data2)
        want2 = match_positions_np(pat2, data2)
        assert got2.tolist() == want2.tolist() == [3]

    def test_zero_diff_primary_selection(self, rng):
        """Keyword 'aab...' has a zero first diff; the scanner must pick a
        nonzero primary and stay exact on constant regions."""
        from monkey_moore_tpu.native import native_dense_scan
        from monkey_moore_tpu.ops.scan_np import match_positions_np

        pat = compile_pattern("aabc")
        data = np.zeros(4096, dtype=np.uint8)
        enc = np.array([5, 5, 6, 7], dtype=np.uint8)
        data[100:104] = enc
        data[4092:4096] = enc
        got = native_dense_scan(pat, data)
        assert got.tolist() == match_positions_np(pat, data).tolist()
        assert 100 in got.tolist() and 4092 in got.tolist()

    def test_overflow_retry(self):
        from monkey_moore_tpu.native import native_dense_scan
        from monkey_moore_tpu.ops.scan_np import match_positions_np

        data = np.tile(np.array([1, 2, 3], dtype=np.uint8), 80000)
        pat = compile_pattern([97, 98, 99])  # matches every period
        got = native_dense_scan(pat, data)
        want = match_positions_np(pat, data)
        assert len(got) > 65536
        assert got.tolist() == want.tolist()


class TestNativeDenseScanBswap:
    """``mm_dense_scan_u16be``: big-endian u16 scanned in place (byteswap
    on load) must agree with the scanner run on a byteswapped copy."""

    def test_fuzz_bswap_vs_swapped_copy(self, rng):
        from monkey_moore_tpu.native import native_dense_scan
        from monkey_moore_tpu.ops.scan_np import match_positions_np

        letters = np.arange(97, 123)
        for trial in range(40):
            n = int(rng.integers(6, 4000))
            data = rng.integers(0, 65536, n)
            kw = rng.choice(letters, int(rng.integers(2, 8))).tolist()
            use_wc = len(kw) >= 3 and rng.random() < 0.4
            if use_wc:
                for i in range(1, len(kw) - 1):
                    if rng.random() < 0.3:
                        kw[i] = ord("*")
            for _ in range(int(rng.integers(0, 5))):
                pos = int(rng.integers(0, max(1, n - len(kw))))
                data[pos : pos + len(kw)] = (
                    np.array(kw) + int(rng.integers(-40, 40))
                ) % 65536
            pat = compile_pattern(
                kw, "*" if use_wc else 0, dtype=np.uint16
            )
            true_vals = data.astype(np.uint16)  # the BE-decoded values
            # the raw native-order view of those values stored big-endian
            raw_view = true_vals.astype(">u2").tobytes()
            arr = np.frombuffer(raw_view, dtype=np.uint16)
            got = native_dense_scan(pat, arr, bswap=True)
            assert got is not None
            want = match_positions_np(pat, true_vals)
            assert got.tolist() == want.tolist(), (kw, trial)

    def test_host_candidates_values_bswap_recovery(self, rng):
        """Recovery values must be the TRUE (decoded) element values even
        when the grid is a zero-copy native-order view of BE data."""
        from monkey_moore_tpu.ops.scan_host import host_candidates_values

        pat = compile_pattern("monkey", dtype=np.uint16)
        true_vals = rng.integers(0, 65536, 500).astype(np.uint16)
        enc = (np.array(pat.keyword) + 1000) % 65536
        true_vals[100:106] = enc
        arr = np.frombuffer(
            true_vals.astype(">u2").tobytes(), dtype=np.uint16
        )
        offs, vals = host_candidates_values(pat, arr, bswap=True)
        assert offs.tolist() == [100]
        # v0 is the value at the recovery shift — a true decoded value
        assert 0 <= int(vals[0, 0]) < 65536
        assert int(vals[0, 0]) in set(enc.astype(np.int64).tolist())

    def test_engine_be_results_and_zero_decode_copy(self, tmp_path, rng):
        """Engine-level: a BE 16-bit host search returns the identical
        results as before (vs the oracle-backed REFERENCE walk grid) with
        the zero-copy view path."""
        from monkey_moore_tpu.config import Endianness, SearchConfig
        from monkey_moore_tpu.engine import SearchEngine

        n = 60_000
        true_vals = rng.integers(0, 65536, n).astype(np.uint16)
        pat = compile_pattern("monkey", dtype=np.uint16)
        enc = (np.array(pat.keyword) + 777) % 65536
        true_vals[1234:1240] = enc
        true_vals[30001:30007] = enc
        p = tmp_path / "be.bin"
        p.write_bytes(true_vals.astype(">u2").tobytes())
        cfg = SearchConfig(
            file_path=p, keyword="monkey", element_width=2,
            endianness=Endianness.BIG,
        )
        e = SearchEngine(cfg)
        offs = [r.offset for r in e.run()]
        assert e.last_stats.host_routed
        assert offs == [2468, 60002]
