import pathlib

import pytest

from jxl_tpu.io.bit_reader import BitReader
from jxl_tpu.io.container import extract_codestream
from jxl_tpu.io.headers import ColorSpace, FileHeader, Orientation

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def parse_file(name: str) -> FileHeader:
    data = (CORPUS / name).read_bytes()
    return FileHeader.read(BitReader(extract_codestream(data)))


def test_tiny_lossless():
    fh = parse_file("3x3_srgb_lossless.jxl")
    assert (fh.xsize, fh.ysize) == (3, 3)
    assert not fh.image_metadata.xyb_encoded
    assert fh.image_metadata.bit_depth.bits_per_sample == 8
    assert fh.image_metadata.num_extra_channels == 0


def test_tiny_lossy_is_xyb():
    fh = parse_file("3x3_srgb_lossy.jxl")
    assert (fh.xsize, fh.ysize) == (3, 3)
    assert fh.image_metadata.xyb_encoded


def test_alpha_file_has_extra_channel():
    fh = parse_file("3x3a_srgb_lossless.jxl")
    assert fh.image_metadata.num_extra_channels == 1


def test_orientation_files():
    for i, name in enumerate(
        [
            "orientation1_identity.jxl",
            "orientation2_flip_horizontal.jxl",
            "orientation3_rotate_180.jxl",
            "orientation4_flip_vertical.jxl",
            "orientation5_transpose.jxl",
            "orientation6_rotate_90_cw.jxl",
            "orientation7_anti_transpose.jxl",
            "orientation8_rotate_90_ccw.jxl",
        ]
    ):
        fh = parse_file(name)
        assert fh.image_metadata.orientation == Orientation(i + 1), name


def test_grayscale():
    fh = parse_file("gray_alpha_lossless.jxl")
    assert fh.image_metadata.color_encoding.color_space == ColorSpace.GRAY
    assert fh.image_metadata.num_extra_channels == 1


@pytest.mark.parametrize(
    "name",
    sorted(p.name for p in CORPUS.glob("*.jxl")) if CORPUS.is_dir() else [],
)
def test_parse_all_corpus_headers(name):
    # Every corpus file's image-level headers must parse without error
    # (a few are deliberately malformed past the headers; headers are fine).
    fh = parse_file(name)
    assert fh.xsize > 0 and fh.ysize > 0
