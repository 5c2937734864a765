import pytest

from jxl_tpu.errors import NonZeroPadding, OutOfBounds
from jxl_tpu.io.bit_reader import BitReader
from jxl_tpu.io.bundle import U64, unpack_signed


def test_read_basic():
    br = BitReader(bytes([0, 1]))
    assert br.read(8) == 0
    assert br.read(4) == 1
    assert br.read(4) == 0
    assert br.total_bits_read() == 16
    with pytest.raises(OutOfBounds):
        br.read(1)


def test_lsb_first_order():
    # 0b1011_0100 = 0xb4 → bits come out LSB first: 0,0,1,0,1,1,0,1
    br = BitReader(bytes([0xB4]))
    assert [br.read(1) for _ in range(8)] == [0, 0, 1, 0, 1, 1, 0, 1]


def test_peek_zero_pads():
    br = BitReader(bytes([0xFF]))
    assert br.peek(16) == 0x00FF


def test_skip_and_boundary():
    br = BitReader(bytes([0x01, 0x01]))
    assert br.read(1) == 1
    br.jump_to_byte_boundary()
    assert br.total_bits_read() == 8
    br2 = BitReader(bytes([0xFF]))
    br2.read(1)
    with pytest.raises(NonZeroPadding):
        br2.jump_to_byte_boundary()


def test_split_at():
    br = BitReader(bytes(range(10)))
    br.read(8)
    sect = br.split_at(4)
    assert [sect.read(8) for _ in range(4)] == [1, 2, 3, 4]
    with pytest.raises(OutOfBounds):
        sect.read(1)
    assert br.read(8) == 5


def test_u64_coder():
    # selector 0 -> 0
    br = BitReader(bytes([0b00]))
    assert U64().read(br) == 0
    # selector 1, 4 bits value 5 -> 6 : bits 01 then 0101
    br = BitReader(bytes([0b010101]))
    assert U64().read(br) == 6
    # selector 2, 8 bits 0 -> 17
    br = BitReader(bytes([0b10, 0]))
    assert U64().read(br) == 17


def test_unpack_signed():
    assert [unpack_signed(u) for u in range(5)] == [0, -1, 1, -2, 2]


def test_bits_available():
    br = BitReader(bytes(4))
    assert br.total_bits_available() == 32
    br.read(5)
    assert br.total_bits_available() == 27
