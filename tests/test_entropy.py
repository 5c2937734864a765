"""Entropy-layer tests, including golden vectors from the reference's own
unit tests (ans.rs, huffman.rs) and the has_permutation.jxl TOC which
exercises ANS + context map + hybrid uint + LZ77 gating + Lehmer decode."""

import pathlib

from jxl_tpu.entropy.ans import SUM_PROBS, AnsHistogram
from jxl_tpu.entropy.huffman import HuffmanCodes
from jxl_tpu.io.bit_reader import BitReader
from jxl_tpu.io.container import extract_codestream
from jxl_tpu.io.headers import FileHeader
from jxl_tpu.io.headers.frame import Encoding, FrameHeader, FrameType, Toc

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def load_frame(name):
    br = BitReader(extract_codestream((CORPUS / name).read_bytes()))
    fh = FileHeader.read(br)
    fr = FrameHeader.read(br, fh)
    toc = Toc.read(br, fr.num_toc_entries)
    return fh, fr, toc


def test_ans_single_symbol():
    br = BitReader(bytes([0b00100101, 0b01]))
    h = AnsHistogram.decode(br, 5)
    assert h.dist[20] == SUM_PROBS
    assert h.single_symbol == 20


def test_ans_two_symbols():
    br = BitReader(bytes([0b10011111, 0b10010010, 0b00000000, 0b00010]))
    h = AnsHistogram.decode(br, 5)
    assert h.dist[10] == 256
    assert h.dist[20] == SUM_PROBS - 256
    assert sum(h.dist) == SUM_PROBS


def test_ans_alias_invariant():
    # distribution must sum to SUM_PROBS after alias-map construction
    br = BitReader(bytes([0b10011111, 0b10010010, 0b00000000, 0b00010]))
    h = AnsHistogram.decode(br, 5)
    # every state decodes consistently: home or alias bucket
    for state in range(0, 1 << 12, 97):
        i = state >> h.log_bucket_size
        pos = state & h.bucket_mask
        if pos >= h.alias_cutoff[i]:
            assert h.alias_dist[i] == h.dist[h.alias_symbol[i]]


def test_huffman_byte_histogram():
    br = BitReader(bytes([0b11101111, 0b00111111, 0, 1, 0, 0b10100000, 0b0110]))
    codes = HuffmanCodes.decode(1, br)
    expected = [8, 13, 21, 34, 55, 89, 144, 233]
    data = bytes(int(format(v, "08b")[::-1], 2) for v in expected)
    br2 = BitReader(data)
    assert [codes.read(br2, 0) for _ in expected] == expected


def test_basic_toc():
    _, fr, toc = load_frame("basic.jxl")
    assert fr.frame_type == FrameType.REGULAR
    assert fr.encoding == Encoding.VARDCT
    assert (fr.x_qm_scale, fr.b_qm_scale) == (2, 2)
    assert fr.restoration_filter.epf_iters == 1
    assert toc.entries == [53] and not toc.permuted


def test_extra_channels_header():
    _, fr, _ = load_frame("extra_channels.jxl")
    assert fr.encoding == Encoding.MODULAR
    assert fr.ec_upsampling == [1]
    assert fr.restoration_filter.epf_iters == 0
    assert not fr.restoration_filter.gab


def test_named_frame():
    _, fr, _ = load_frame("named_frame_test.jxl")
    assert fr.name == "TestFrameName"


def test_permuted_toc_golden():
    # golden vector from ref headers/frame_header.rs test_has_permutation
    _, fr, toc = load_frame("has_permutation.jxl")
    assert toc.permuted
    assert toc.permutation == [
        0, 1, 42, 48, 2, 3, 4, 5, 6, 7, 8, 9, 43, 10, 11, 12, 13, 14, 15, 16, 17,
        44, 18, 19, 20, 21, 22, 23, 24, 25, 45, 26, 27, 28, 29, 30, 31, 32, 33, 46,
        34, 35, 36, 37, 38, 39, 40, 41, 47,
    ]
    assert toc.entries == [
        155, 992, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 9, 9, 9, 9, 9, 9,
        9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 5, 5, 5, 5, 5, 5, 5, 5, 697, 5, 5, 5, 5, 5, 60,
    ]


def test_lehmer_decode():
    from jxl_tpu.io.headers.permutation import decode_lehmer_code

    # golden vectors from ref permutation.rs tests
    code = [1, 1, 2, 3, 3, 6, 0, 1]
    out = decode_lehmer_code(code, list(range(4, 16)))
    assert out == [5, 6, 8, 10, 11, 15, 4, 9, 7, 12, 13, 14]
    assert decode_lehmer_code([2, 3, 0, 0, 0], list(range(5))) == [2, 4, 0, 1, 3]
