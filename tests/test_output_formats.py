"""Output pixel formats (ConvertF32To{U8,U16,F16}, ref convert.rs:549-)
and preview frame decoding (ref options.rs skip_preview)."""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.decoder import Event, JxlDecoder, JxlDecoderOptions
from jxl_tpu.api.simple import decode_image

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


@pytest.fixture(scope="module")
def gq_data():
    path = CORPUS / "green_queen_vardct_e3.jxl"
    if not path.exists():
        pytest.skip("corpus not available")
    return path.read_bytes()


def test_u8_output(gq_data):
    a = decode_image(gq_data, pixel_format="u8").frames[0]
    b = decode_image(gq_data).frames[0]
    assert a.dtype == np.uint8
    bq = np.round(np.clip(b, 0, 1) * 255).astype(np.int16)
    # blue-noise dither perturbs by at most 1 LSB
    assert int(np.abs(a.astype(np.int16) - bq).max()) <= 1


def test_u16_output(gq_data):
    a = decode_image(gq_data, pixel_format="u16").frames[0]
    b = decode_image(gq_data).frames[0]
    assert a.dtype == np.uint16
    bq = np.round(np.clip(b, 0, 1) * 65535).astype(np.int32)
    assert int(np.abs(a.astype(np.int32) - bq).max()) <= 1


def test_f16_output(gq_data):
    a = decode_image(gq_data, pixel_format="f16").frames[0]
    assert a.dtype == np.float16


def test_u8_with_alpha():
    path = CORPUS / "3x3a_srgb_lossless.jxl"
    if not path.exists():
        pytest.skip("corpus not available")
    a = decode_image(path.read_bytes(), pixel_format="u8").frames[0]
    assert a.dtype == np.uint8
    assert a.shape[-1] == 4


def test_streaming_pixel_format(gq_data):
    d = JxlDecoder(JxlDecoderOptions(pixel_format="u8"))
    d.feed(gq_data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    assert d.frames[0].dtype == np.uint8


def test_preview_decode():
    path = CORPUS / "with_preview.jxl"
    if not path.exists():
        pytest.skip("corpus not available")
    data = path.read_bytes()
    d = JxlDecoder(JxlDecoderOptions(skip_preview=False))
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    assert d.image_info.preview_size == (16, 16)
    assert d.preview is not None and d.preview.shape[:2] == (16, 16)
    # default: preview skipped, main frame unaffected
    d2 = JxlDecoder()
    d2.feed(data)
    d2.end_input()
    while d2.process() is not Event.COMPLETE:
        pass
    assert d2.preview is None
    assert np.array_equal(d.frames[0], d2.frames[0])
