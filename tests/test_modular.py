"""End-to-end Modular decode tests on the reference corpus.

Correctness signals: every modular sub-stream's ANS final state must equal
0x130000 and all reads must stay in bounds — decoding a multi-group file
therefore validates tree decode, predictors (incl. weighted), LZ77/RLE,
palette/RCT/squeeze inverses, and section/group splitting end to end.
Plus a literal pixel golden for the 3x3 test pattern.
"""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.simple import decode_first_frame

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def decode(name):
    return decode_first_frame((CORPUS / name).read_bytes())


def test_3x3_lossless_pixels():
    df = decode("3x3_srgb_lossless.jxl")
    r, g, b = df.channels
    assert r.tolist() == [[255, 0, 0], [128, 64, 64], [255, 128, 0]]
    assert g.tolist() == [[0, 255, 0], [64, 128, 64], [255, 128, 0]]
    assert b.tolist() == [[0, 0, 255], [64, 64, 128], [255, 128, 0]]


def test_3x3_alpha():
    df = decode("3x3a_srgb_lossless.jxl")
    assert len(df.channels) == 4
    assert df.channels[3].shape == (3, 3)


def test_gray_alpha():
    df = decode("gray_alpha_lossless.jxl")
    assert len(df.channels) == 2
    assert all(ch.shape == (64, 64) for ch in df.channels)
    for ch in df.channels:
        assert ch.min() >= 0 and ch.max() <= 255


def test_squeeze_edge():
    # 513x513 exercises squeeze tail (odd-size) handling in both directions
    df = decode("squeeze_edge.jxl")
    assert df.channels[0].shape == (513, 513)


def test_squeeze_empty_residual():
    df = decode("squeeze_empty_residual.jxl")
    assert df.channels[0].shape == (1, 1)


def test_extra_channels():
    df = decode("extra_channels.jxl")
    assert len(df.channels) == 4


@pytest.mark.slow
def test_palette_large():
    df = decode("issue648_palette0.jxl")
    assert df.channels[0].shape == (1080, 1623)


@pytest.mark.slow
def test_tree_max_property():
    # property 20 = previous-channel reference properties
    df = decode("tree_max_property_20.jxl")
    assert df.channels[0].shape == (1024, 1024)
