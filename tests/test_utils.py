"""Utility tests — port of ``tests/test_text_utils.cpp`` plus align_up and
encoding helpers."""

import pytest

from monkey_moore_tpu.utils import (
    align_up,
    count_prefix_length,
    find_last_index,
    is_ascii_lower,
    is_ascii_upper,
    to_utf8,
)


class TestFindLastIndex:
    data = [3, 3, 5, 7, 6, 3, 8, 9, 3, 10]

    def test_last_occurrence(self):
        assert find_last_index(self.data, 3) == 8

    def test_not_found(self):
        assert find_last_index(self.data, 2) == -1


class TestCountPrefixLength:
    data = [3, 3, 3, 3, 6, 3, 8, 9, 3, 10]

    def test_repeated_prefix(self):
        assert count_prefix_length(self.data, 3) == 4

    def test_not_at_start(self):
        assert count_prefix_length(self.data, 6) == 0

    def test_absent(self):
        assert count_prefix_length(self.data, 2) == 0


class TestAsciiClasses:
    def test_upper(self):
        assert sum(is_ascii_upper(ord(c)) for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ") == 26
        assert sum(is_ascii_upper(ord(c)) for c in "=+_-.,;()[]{}") == 0

    def test_lower(self):
        assert sum(is_ascii_lower(ord(c)) for c in "abcdefghijklmnopqrstuvwxyz") == 26
        assert sum(is_ascii_lower(ord(c)) for c in "=+_-.,;()[]{}") == 0

    def test_non_ascii_codepoints_rejected(self):
        assert not is_ascii_upper(0x3042)
        assert not is_ascii_lower(0x3042)


class TestAlignUp:
    def test_basic(self):
        assert align_up(0, 2) == 0
        assert align_up(1, 2) == 2
        assert align_up(2, 2) == 2
        assert align_up(5, 4) == 8

    def test_non_power_of_two_raises(self):
        with pytest.raises(ValueError):
            align_up(3, 3)


class TestEncoding:
    def test_ascii(self):
        assert to_utf8(ord("a")) == b"a"

    def test_multibyte(self):
        assert to_utf8(0x3042) == "あ".encode("utf-8")
