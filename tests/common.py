"""Shared test fixtures/helpers.

Python counterpart of the reference's ``tests/common.hpp``:

- ``shift_alpha_values`` (``common.hpp:112-128``) — "encode" plaintext by
  shifting lower/upper ASCII letters independently;
- ``assert_matching_ascii_result`` (``common.hpp:73-86``) and
  ``assert_char_seq_result`` (``common.hpp:88-110``) — offset + equivalency
  map assertions;
- ``u16_hiragana_to_u8`` (``common.hpp:130-139``);
- ``temp_file`` — on-disk fixture like ``TempFile`` (``common.hpp:28-63``).
"""

from __future__ import annotations

import numpy as np

# 49-char hiragana ordering used by the reference algorithm tests
# (``tests/test_monkey_moore.cpp:10-11``).
HIRAGANA_SEQ = (
    "あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほ"
    "まみむめもやゆよらりるれろわをゃっゅょ"
)

# Full Unicode hiragana block ordering used by the engine preview tests
# (``tests/test_search_engine.cpp:305``).
UNICODE_HIRAGANA_SEQ = "".join(chr(c) for c in range(0x3041, 0x30A0))


def text_data(text: str, dtype=np.uint8, offset: int = 0) -> np.ndarray:
    """Element array from text with a per-char shift (TempFile text ctor,
    ``common.hpp:33-45``)."""
    return (
        np.array([ord(c) for c in text], dtype=np.int64) + offset
    ).astype(dtype)


def shift_alpha(values, lower_shift: int, upper_shift: int, dtype=np.uint8):
    """Shift ASCII lowercase/uppercase letters by independent amounts."""
    out = []
    for v in values:
        c = v if isinstance(v, int) else ord(v)
        if 0x61 <= c <= 0x7A:
            c += lower_shift
        elif 0x41 <= c <= 0x5A:
            c += upper_shift
        out.append(c)
    return np.array(out, dtype=np.int64).astype(dtype)


def cp(s: str) -> tuple:
    return tuple(ord(c) for c in s)


def assert_matching_ascii_result(result, expected_offset, expected_a, expected_A):
    offset, vmap = result
    assert offset == expected_offset
    assert vmap[ord("a")] == expected_a
    assert vmap[ord("A")] == expected_A


def assert_char_seq_result(char_seq, vmap, expected_values):
    for index, seq_char in enumerate(char_seq):
        c = seq_char if isinstance(seq_char, int) else ord(seq_char)
        assert vmap[c] == expected_values[index], (
            f"seq element {index} ({chr(c)!r}): "
            f"got {vmap[c]}, want {expected_values[index]}"
        )


def u16_hiragana_to_u8(text: str) -> np.ndarray:
    """(codepoint - 0x3000) & 0xFF per char (``common.hpp:130-139``)."""
    return np.array([(ord(c) - 0x3000) & 0xFF for c in text], dtype=np.uint8)


def wrap8(x: int) -> int:
    return x & 0xFF


def wrap16(x: int) -> int:
    return x & 0xFFFF
