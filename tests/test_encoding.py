"""Encoding-table parity with the reference
(/root/reference/src/encoding.rs:4-41)."""

import numpy as np

from distance_tpu.encoding import ENCODING, ALL_CODES, encoding_array


EXPECTED = {
    "A": 136, "G": 72, "C": 40, "T": 24,
    "R": 192, "M": 160, "W": 144, "S": 96, "K": 80, "Y": 48,
    "V": 224, "H": 176, "D": 208, "B": 112, "N": 240,
    "-": 244, "?": 242,
}


def test_exact_codes():
    for ch, code in EXPECTED.items():
        assert ENCODING[ord(ch)] == code
        if ch.isalpha():
            assert ENCODING[ord(ch.lower())] == code


def test_unmapped_bytes_are_zero():
    mapped = set()
    for ch in EXPECTED:
        mapped.add(ord(ch))
        mapped.add(ord(ch.lower()))
    for b in range(256):
        if b not in mapped:
            assert ENCODING[b] == 0, b


def test_bit_semantics():
    # bit 3 == "known exactly" only for A/C/G/T codes.
    known = {136, 72, 40, 24}
    for code in ALL_CODES:
        assert (int(code) & 8 == 8) == (int(code) in known)
    # candidacy nibbles are all distinct and nonzero.
    nibbles = [int(c) >> 4 for c in ALL_CODES]
    assert all(n != 0 for n in nibbles)
    # encode is a function of the nibble except N/-/? which share 15.
    from collections import Counter

    c = Counter(nibbles)
    assert c[15] == 3
    assert all(v == 1 for k, v in c.items() if k != 15)


def test_encoding_array_fn():
    assert np.array_equal(encoding_array(), ENCODING)
