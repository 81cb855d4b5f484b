"""Pattern compiler unit tests (layer L0).

Checks compiled tables against hand-computed values, including the reference's
worked example ``*ounter**easure`` (comment block at
``src/core/monkey_moore.cpp:208-220``) and the skip-table cardinality
regression (``tests/test_monkey_moore.cpp:304-344``).
"""

import numpy as np
import pytest

from monkey_moore_tpu.pattern import (
    PatternError,
    SearchMode,
    compile_pattern,
)
from common import cp


class TestModeSelection:
    def test_plain_lowercase_is_simple(self):
        pat = compile_pattern("catch")
        assert pat.mode is SearchMode.SIMPLE
        assert pat.signed_compare

    def test_wildcard_char_triggers_wildcard_mode(self):
        pat = compile_pattern("b*tter", wildcard="*")
        assert pat.mode is SearchMode.WILDCARD
        assert not pat.signed_compare

    def test_mixed_case_triggers_wildcard_mode(self):
        # Auto case-wildcarding (``monkey_moore.cpp:66-77,150-181``).
        pat = compile_pattern("Butter")
        assert pat.mode is SearchMode.WILDCARD
        assert pat.has_case_change

    def test_mixed_case_with_custom_seq_stays_simple(self):
        # has_case_change is only computed for ASCII mode
        # (``monkey_moore.cpp:68-73``).
        pat = compile_pattern("Ab" + "c", char_seq="Abc")
        assert pat.mode is SearchMode.SIMPLE

    def test_value_scan(self):
        pat = compile_pattern(reference_values=[60, 61, 62])
        assert pat.mode is SearchMode.VALUE_SCAN
        assert pat.wildcard == 0

    def test_empty_keyword_raises(self):
        with pytest.raises(PatternError):
            compile_pattern("")
        with pytest.raises(PatternError):
            compile_pattern(reference_values=[])


class TestSimpleTables:
    def test_circular_diffs(self):
        # diff[0] = key[0]-key[-1]; diff[i] = key[i]-key[i-1]
        # (``monkey_moore.cpp:551-567``).
        pat = compile_pattern("catch")
        k = [ord(c) for c in "catch"]
        expect = [k[0] - k[4], k[1] - k[0], k[2] - k[1], k[3] - k[2], k[4] - k[3]]
        assert pat.expected_diff.tolist() == expect

    def test_custom_seq_diffs_use_indices(self):
        seq = "aiueobcdfghjklmnpqrstvwxyz"
        pat = compile_pattern("match", char_seq=seq)
        idx = {c: i for i, c in enumerate(seq)}
        k = [idx[c] for c in "match"]
        expect = [k[0] - k[4], k[1] - k[0], k[2] - k[1], k[3] - k[2], k[4] - k[3]]
        assert pat.expected_diff.tolist() == expect

    def test_skip_table_rightmost_occurrence_wins(self):
        # "abcde": diff[1..4] all +1; descending build with first-write-wins
        # keeps the i=4 entry: skip = L-1-i = 0 (``monkey_moore.cpp:127-141``).
        pat = compile_pattern("abcde")
        assert pat.skip_table[1 + pat.tmax] == 0
        # Unseen diff values keep the default jump L-1.
        assert pat.skip_table[100 + pat.tmax] == 4
        # The wrap diff (i=0, value -4) writes the same value as the default.
        assert pat.skip_table[-4 + pat.tmax] == 4

    def test_skip_table_size_covers_full_cardinality(self):
        # Regression parity: table size = 2*(max+1), so diff index tmax + tmax
        # is addressable (``monkey_moore.cpp:63``,
        # ``tests/test_monkey_moore.cpp:304-344``).
        pat8 = compile_pattern("text")
        assert len(pat8.skip_table) == 2 * 256
        pat16 = compile_pattern("text", dtype=np.uint16)
        assert len(pat16.skip_table) == 2 * 65536

    def test_out_of_range_diff_raises(self):
        # Keyword diffs beyond ±tmax overflow the table index
        # (``monkey_moore.cpp:137-140``): kanji codepoints in 8-bit ASCII mode.
        with pytest.raises(PatternError):
            compile_pattern("a行b")

    def test_dense_checks_simple(self):
        pat = compile_pattern("catch")
        assert pat.chk_shift_cur.tolist() == [1, 2, 3, 4]
        assert pat.chk_shift_prev.tolist() == [0, 1, 2, 3]
        assert pat.chk_expected.tolist() == pat.expected_diff[1:].tolist()

    def test_advance(self):
        assert compile_pattern("catch").advance == 4


class TestWildcardTables:
    def test_worked_example_counter_measure(self):
        """The ``*ounter**easure`` table from ``monkey_moore.cpp:208-220``.

        (The comment's expected_diff entry at position 9 reads -14, but
        'e'-'r' = -13; the code computes -13 — asserted here.)
        """
        pat = compile_pattern("*ounter**easure", wildcard="*")
        assert pat.mode is SearchMode.WILDCARD
        assert pat.is_literal.tolist() == [
            False, True, True, True, True, True, True,
            False, False, True, True, True, True, True, True,
        ]
        assert pat.bridge_offset.tolist() == [
            0, 13, -1, -1, -1, -1, -1, 0, 0, -3, -1, -1, -1, -1, -1
        ]
        assert pat.wc_mask.tolist() == [
            0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF,
            0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF,
        ]
        assert pat.expected_diff.tolist() == [
            0, 10, 6, -7, 6, -15, 13, 0, 0, -13, -4, 18, 2, -3, -13
        ]
        assert pat.wildcards_count == 3
        assert pat.leading_wildcards == 1
        assert pat.first_literal == 1
        assert pat.advance == 15 - 1 - 1

    def test_wc_expected_wraps_in_element_type(self):
        pat = compile_pattern("*ounter**easure", wildcard="*")
        # -15 wraps to 241 in uint8 (``monkey_moore.cpp:244``).
        assert pat.wc_expected[5] == (256 - 15)
        assert pat.wc_expected.dtype == np.uint8

    def test_mixed_case_normalization_minority_replaced(self):
        # "Butter": 1 upper, 5 lower → uppercase replaced by wildcard
        # (``monkey_moore.cpp:165-180``); wildcard is the configured char.
        pat = compile_pattern("Butter", wildcard="*")
        assert pat.case_normalized == cp("*utter")
        assert pat.mostly_lowercase
        assert pat.first_opposing == 0  # first uppercase char of original

    def test_mixed_case_tie_replaces_uppercase(self):
        # Equal counts: the `uppercase > lowercase` branch is false, so
        # uppercase chars are replaced and mostly_lowercase == False
        # (``monkey_moore.cpp:163-180``).
        pat = compile_pattern("ABab", wildcard="*")
        assert pat.case_normalized == cp("**ab")
        assert not pat.mostly_lowercase
        # not mostly_lowercase → opposing = first *lowercase* char
        assert pat.first_opposing == 2

    def test_wildcard_skip_table(self):
        # ``monkey_moore.cpp:278-303``: wildcard positions jump 1; literal
        # positions jump max(i - last_wc_before_i - 1, 1).
        pat = compile_pattern("*ounter**easure", wildcard="*")
        #             index:   0  1  2  3  4  5  6  7  8  9 10 11 12 13 14
        assert pat.wildcard_skip_table.tolist() == [
            1, 1, 1, 2, 3, 4, 5, 1, 1, 1, 1, 2, 3, 4, 5
        ]

    def test_wc_skip_table_leftmost_wins(self):
        # The wildcard-mode bad-character build has no first-write guard, so
        # the *leftmost* i >= 1 occurrence wins (``monkey_moore.cpp:257-276``).
        pat = compile_pattern("abcde*", wildcard="*")
        # diffs at i=1..4 are all +1 with remaining_wc: i=4 has 1 wc after.
        # i=1 written last: skip[+1] = L - wc_after(1) - 1 - 1 = 6-1-2 = 3.
        assert pat.skip_table[1 + 255] == 3

    def test_dense_checks_skip_wildcards_and_first_literal(self):
        pat = compile_pattern("b*tter", wildcard="*")
        # literals: 0,2,3,4,5; checks at 2,3,4,5 bridging 0,2,3,4... literal 2
        # bridges to 0 (over the wildcard).
        assert pat.chk_shift_cur.tolist() == [2, 3, 4, 5]
        assert pat.chk_shift_prev.tolist() == [0, 2, 3, 4]

    def test_all_wildcards(self):
        pat = compile_pattern("***", wildcard="*")
        assert pat.first_literal == -1
        assert len(pat.chk_shift_cur) == 0
        assert pat.leading_wildcards == 3


class TestMixedCaseOpposing:
    def test_first_opposing_mostly_lower(self):
        # mostly lowercase → first *uppercase* char of the original keyword
        # (``monkey_moore.cpp:490-499``).
        pat = compile_pattern("aAbB")  # 2 lower, 2 upper: tie → not mostly_lower
        assert not pat.mostly_lowercase
        # not mostly_lowercase → target is first lowercase char = index 0
        assert pat.first_opposing == 0

    def test_first_opposing_mostly_upper(self):
        pat = compile_pattern("BUTTEr")
        assert not pat.mostly_lowercase
        assert pat.first_opposing == 5  # first lowercase char
