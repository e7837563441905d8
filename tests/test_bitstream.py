"""Bitstream writer unit tests (common/bitstream.h semantics)."""

import numpy as np
import pytest

from x264dsp_tpu.entropy.bitstream import (
    BitWriter, nal_escape, nal_unit, size_se, size_te, size_ue,
)
from x264dsp_tpu.utils.annexb import split_nals, unescape_ebsp


def test_write_bits_msb_first():
    bw = BitWriter()
    bw.write(8, 0xAB)
    bw.write(4, 0xC)
    bw.write(4, 0xD)
    assert bw.get_bytes() == b"\xab\xcd"


def test_write_spanning_accumulator():
    bw = BitWriter()
    for i in range(5):
        bw.write(13, i * 1000 + 7)
    bw.align_0()
    bits = "".join(format(i * 1000 + 7, "013b") for i in range(5))
    bits += "0" * (-len(bits) % 8)
    assert bw.get_bytes() == int(bits, 2).to_bytes(len(bits) // 8, "big")


@pytest.mark.parametrize("v,expected_bits", [
    (0, "1"), (1, "010"), (2, "011"), (3, "00100"),
    (7, "0001000"), (8, "0001001"),
])
def test_ue_golomb(v, expected_bits):
    bw = BitWriter()
    bw.write_ue(v)
    assert bw.bit_pos == len(expected_bits) == size_ue(v)
    bw.align_0()
    got = format(int.from_bytes(bw.get_bytes(), "big"),
                 f"0{8 * len(bw.get_bytes())}b")[:len(expected_bits)]
    assert got == expected_bits


@pytest.mark.parametrize("v,code", [(0, 0), (1, 1), (-1, 2), (2, 3), (-2, 4), (3, 5)])
def test_se_maps_to_ue(v, code):
    a, b = BitWriter(), BitWriter()
    a.write_se(v)
    b.write_ue(code)
    a.align_0(), b.align_0()
    assert a.get_bytes() == b.get_bytes()
    assert size_se(v) == size_ue(code)


def test_te_golomb():
    bw = BitWriter()
    bw.write_te(1, 0)   # single bit, inverted
    bw.write_te(1, 1)
    assert bw.bit_pos == 2
    bw.align_0()
    assert bw.get_bytes()[0] >> 6 == 0b10
    assert size_te(1, 0) == 1 and size_te(5, 2) == size_ue(2)


def test_rbsp_trailing():
    bw = BitWriter()
    bw.write(3, 0b101)
    bw.rbsp_trailing()
    assert bw.get_bytes() == bytes([0b10110000])


@pytest.mark.parametrize("payload,expected", [
    (b"\x00\x00\x00", b"\x00\x00\x03\x00"),
    (b"\x00\x00\x01", b"\x00\x00\x03\x01"),
    (b"\x00\x00\x04", b"\x00\x00\x04"),
    (b"\x00\x00\x00\x00\x00\x01", b"\x00\x00\x03\x00\x00\x03\x00\x01"),
    (b"\xff\x00\x00\x02\xff", b"\xff\x00\x00\x03\x02\xff"),
    (b"", b""), (b"\x00\x00", b"\x00\x00"),
])
def test_nal_escape(payload, expected):
    assert nal_escape(payload) == expected


def test_nal_escape_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(50):
        # biased toward zeros to exercise escaping densely
        raw = rng.choice([0, 0, 0, 1, 2, 3, 255], size=200).astype(np.uint8).tobytes()
        esc = nal_escape(raw)
        assert unescape_ebsp(esc) == raw
        # escaped stream must not contain 00 00 [00-02] (00 00 03 is the
        # emulation-prevention marker itself and is legal)
        for i in range(2, len(esc)):
            assert not (esc[i - 2] == 0 and esc[i - 1] == 0 and esc[i] <= 2)


def test_nal_unit_and_split():
    n1 = nal_unit(7, 3, b"\x42\x00\x0a", long_startcode=True)
    n2 = nal_unit(1, 2, b"\x00\x00\x01\xff", long_startcode=False)
    nals = split_nals(n1 + n2)
    assert len(nals) == 2
    assert nals[0][0] == (3 << 5) | 7
    assert unescape_ebsp(nals[1][1:]) == b"\x00\x00\x01\xff"
