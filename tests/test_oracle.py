"""Sequential oracle conformance tests (layer L1).

Port of the reference's algorithm-level suite ``tests/test_monkey_moore.cpp``
(all sections), plus oracle-specific cases documenting the reference's
skip-overshoot quirk.
"""

import numpy as np
import pytest

from monkey_moore_tpu.oracle import OracleSearcher
from common import (
    HIRAGANA_SEQ,
    assert_char_seq_result,
    assert_matching_ascii_result,
    shift_alpha,
)


class TestNoWildcard8Bit:
    # ``test_monkey_moore.cpp:13-53``
    def setup_method(self):
        data = [ord(c) for c in "dddccacatchaat"]
        self.data = shift_alpha(data, 3, 3)

    def test_ascii_match_offset_and_map(self):
        s = OracleSearcher("catch")
        results = s.search(self.data)
        assert len(results) == 1
        assert_matching_ascii_result(results[0], 6, ord("a") + 3, ord("A") + 3)

    def test_ascii_no_match(self):
        s = OracleSearcher("maca")
        assert s.search(self.data) == []

    def test_custom_seq(self):
        seq = "aiueobcdfghjklmnpqrstvwxyz"
        data = np.array([ord(c) for c in "auqqtkcaoaugka"], dtype=np.uint8)
        s = OracleSearcher("match", 0, seq)
        results = s.search(data)
        assert len(results) == 1
        assert results[0][0] == 8
        assert_char_seq_result(
            seq, results[0][1], [ord(c) for c in "abcdefghijklmnopqrstuvwxyz"]
        )


class TestNoWildcard16Bit:
    # ``test_monkey_moore.cpp:55-105``
    def setup_method(self):
        text = "question of price\0the last wish\0"
        self.data = shift_alpha(
            [ord(c) for c in text], -16, -16, dtype=np.uint16
        )

    def test_ascii_match(self):
        s = OracleSearcher("price", dtype=np.uint16)
        results = s.search(self.data)
        assert len(results) == 1
        assert_matching_ascii_result(
            results[0], 12, ord("a") - 16, ord("A") - 16
        )

    def test_ascii_no_match(self):
        s = OracleSearcher("station", dtype=np.uint16)
        assert s.search(self.data) == []

    def test_custom_seq_hiragana(self):
        # あした、わたしたちは、... as 1-based indices into the 49-char sequence.
        data = np.array(
            [1, 12, 16, 110, 44, 16, 12, 16, 17, 26, 110, 22, 44, 22, 110, 26,
             21, 45, 110, 31, 7, 31, 13],
            dtype=np.uint16,
        )
        s = OracleSearcher("わたしたちは", 0, HIRAGANA_SEQ, dtype=np.uint16)
        results = s.search(data)
        assert len(results) == 1
        assert results[0][0] == 4
        assert_char_seq_result(
            HIRAGANA_SEQ, results[0][1], list(range(1, 50))
        )


class TestWildcard8Bit:
    # ``test_monkey_moore.cpp:108-192``
    def setup_method(self):
        text = "thebittertasteoflemonwithbutter,"
        self.data = shift_alpha([ord(c) for c in text], 8, 8)

    def test_wildcard_matches(self):
        s = OracleSearcher("b*tter", "*")
        results = s.search(self.data)
        assert len(results) == 2
        assert_matching_ascii_result(results[0], 3, ord("a") + 8, ord("A") + 8)
        assert_matching_ascii_result(results[1], 25, ord("a") + 8, ord("A") + 8)

    def test_different_wildcard_char(self):
        s = OracleSearcher("t?ste", "?")
        results = s.search(self.data)
        assert len(results) == 1
        assert_matching_ascii_result(results[0], 9, ord("a") + 8, ord("A") + 8)

    def test_no_match(self):
        s = OracleSearcher("past*")
        assert s.search(self.data) == []

    def test_mixed_case(self):
        text = "TheBitterTruthAboutBetterButter."
        data = shift_alpha([ord(c) for c in text], -32, 24)
        s = OracleSearcher("B*tter", "*")
        results = s.search(data)
        assert len(results) == 3
        assert_matching_ascii_result(results[0], 3, ord("a") - 32, ord("A") + 24)
        assert_matching_ascii_result(results[1], 19, ord("a") - 32, ord("A") + 24)
        assert_matching_ascii_result(results[2], 25, ord("a") - 32, ord("A") + 24)

    def test_mixed_case_no_match(self):
        text = "TheBitterTruthAboutBetterButter."
        data = shift_alpha([ord(c) for c in text], -32, 24)
        s = OracleSearcher("Matter")
        assert s.search(data) == []

    def test_custom_seq_wildcards(self):
        seq = "aiueobcdfghjklmnpqrstvwxyz"
        data = np.array([ord(c) for c in "auqqtkcaoaugka"], dtype=np.uint8)
        s = OracleSearcher("*at*h", "*", seq)
        results = s.search(data)
        assert len(results) == 1
        assert results[0][0] == 8
        assert_char_seq_result(
            seq, results[0][1], [ord(c) for c in "abcdefghijklmnopqrstuvwxyz"]
        )


class TestWildcard16Bit:
    # ``test_monkey_moore.cpp:194-247``
    def setup_method(self):
        text = "They muttered: Butter, BETTER, Butcher, matter"
        self.data = shift_alpha(
            [ord(c) for c in text], 15, -9, dtype=np.uint16
        )

    def test_wildcard_mixed_case(self):
        s = OracleSearcher("But**er", "*", dtype=np.uint16)
        results = s.search(self.data)
        assert len(results) == 1
        assert results[0][0] == 31
        assert results[0][1][ord("a")] == (ord("a") + 15) & 0xFFFF
        assert results[0][1][ord("A")] == (ord("A") - 9) & 0xFFFF

    def test_no_match(self):
        s = OracleSearcher("*ITTER", "*", dtype=np.uint16)
        assert s.search(self.data) == []

    def test_custom_seq_kanji_extended(self):
        seq = HIRAGANA_SEQ + "学校行"
        data = np.array(
            [1, 12, 16, 26, 111, 50, 51, 22, 111, 52, 7, 31, 13, 6, 112, 111,
             44, 16, 12, 35, 111, 52, 7, 16, 2, 113],
            dtype=np.uint16,
        )
        s = OracleSearcher("**に*行きますか", "*", seq, dtype=np.uint16)
        results = s.search(data)
        assert len(results) == 1
        assert results[0][0] == 5
        assert_char_seq_result(seq, results[0][1], list(range(1, 53)))


class TestValueScan:
    # ``test_monkey_moore.cpp:250-302``
    def test_8bit_offsets(self):
        data = np.array(
            [0x00, 0x00, 0x25, 0x26, 0x25, 0x26, 0x27, 0x28, 0x29, 0x30, 0x20,
             0x20, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0x89, 0x00, 0x76,
             0x77, 0x78, 0x79, 0x7A, 0x81, 0x00, 0x00, 0x01, 0x00, 0x00],
            dtype=np.uint8,
        )
        s = OracleSearcher(reference_values=[60, 61, 62, 63, 64, 71])
        results = s.search(data)
        assert [r[0] for r in results] == [4, 21]
        assert results[0][1] == {}  # offsets only (``monkey_moore.cpp:377``)

    def test_8bit_no_match(self):
        data = np.zeros(32, dtype=np.uint8)
        s = OracleSearcher(reference_values=[80, 81, 82, 83, 84, 85, 86])
        assert s.search(data) == []

    def test_16bit_offsets(self):
        data = np.array(
            [0x0000, 0x0100, 0x0135, 0x0136, 0x0135, 0x0136, 0x0137, 0x0138,
             0x0139, 0x0140, 0x0120, 0x0120, 0x0000, 0x0100, 0x0101, 0x0000,
             0x0101, 0x0089, 0x0000, 0x0045, 0x0046, 0x0047, 0x0048, 0x0049,
             0x0050, 0x0000, 0x0100, 0x0000, 0x0100, 0x0001, 0x0100, 0x0000],
            dtype=np.uint16,
        )
        s = OracleSearcher(
            reference_values=[105, 106, 107, 108, 109, 116], dtype=np.uint16
        )
        results = s.search(data)
        assert [r[0] for r in results] == [4, 19]

    def test_16bit_no_match(self):
        data = np.zeros(32, dtype=np.uint16)
        s = OracleSearcher(
            reference_values=[200, 201, 205, 208, 209], dtype=np.uint16
        )
        assert s.search(data) == []


class TestSkipTableRegression:
    # ``test_monkey_moore.cpp:304-344``: 0xFF/0xFFFF diff values must index
    # the skip table in bounds (cardinality = max()+1).
    def test_8bit_max_value(self):
        data = np.array(
            [0x98, 0x94, 0x00, 0xFF, 0xFF, 0x00, 0x01, 0xA5, 0xA1, 0x94, 0x85,
             0x98, 0x94],
            dtype=np.uint8,
        )
        s = OracleSearcher("text")
        results = s.search(data)
        assert [r[0] for r in results] == [9]

    def test_16bit_max_value(self):
        data = np.array(
            [0x1098, 0x1094, 0x0000, 0xFFFF, 0xFFFF, 0x1000, 0x1001, 0x10A5,
             0x10A1, 0x1094, 0x1085, 0x1098, 0x1094],
            dtype=np.uint16,
        )
        s = OracleSearcher("text", dtype=np.uint16)
        results = s.search(data)
        assert [r[0] for r in results] == [9]


class TestReferenceQuirks:
    """Documented divergences between the reference's sequential heuristics
    and a dense all-matches scan — the oracle must reproduce the quirks."""

    def test_skip_overshoot_misses_match(self):
        # Mismatch at offset 0 (window diff -4 at position 1) jumps 4 —
        # over the true match at offset 1 (data 6,7,8,9,10 ≡ "abcde"+shift).
        data = np.array([10, 6, 7, 8, 9, 10, 0, 0, 0, 0], dtype=np.uint8)
        s = OracleSearcher("abcde")
        assert s.search(data) == []

    def test_overlap_suppression_periodic_pattern(self):
        # "aaaa" in 6×'a' (+5): dense candidates at 0,1,2; the walk takes 0,
        # then advances L-1=3 → match at 3 doesn't fit... data len 6, L=4:
        # candidates 0,1,2; accept 0, head=3, 3+4>6 → stop.
        data = shift_alpha([ord("a")] * 6, 5, 5)
        s = OracleSearcher("aaaa")
        results = s.search(data)
        assert [r[0] for r in results] == [0]

    def test_overlap_suppression_longer(self):
        # 9×'a', L=4: walk takes 0, head 3, match at 3, head 6... 6+4>9 → stop.
        data = shift_alpha([ord("a")] * 9, 5, 5)
        s = OracleSearcher("aaaa")
        results = s.search(data)
        assert [r[0] for r in results] == [0, 3]

    def test_wildcard_unsigned_wraparound_compare(self):
        # WILDCARD mode compares diffs mod 2^w (``monkey_moore.cpp:461-464``):
        # a data diff of -255 ≡ +1 (mod 256) *matches* expected +1, while
        # SIMPLE mode's signed compare rejects it.
        data = np.array([10, 255, 0, 1, 2, 3], dtype=np.uint8)
        # keyword "abcd*" → wildcard mode; expected literal diffs all +1.
        wc = OracleSearcher("abcd*", "*")
        offsets = [r[0] for r in wc.search(data)]
        assert 1 in offsets  # 255,0,1,2 wraps: 0-255 = -255 ≡ +1 mod 256
        simple = OracleSearcher("abcd")
        offsets_simple = [r[0] for r in simple.search(data)]
        assert 1 not in offsets_simple
