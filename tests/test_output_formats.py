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


def test_u8_tf_lut_accuracy():
    """The u8 color pass's LUT transfer curves (native colors.cc
    tf_lut_u8) must stay within 1 u8 LSB of the exact powf forms on
    dense linear-RGB inputs for every TF kind."""
    import ctypes

    from jxl_tpu import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    h, w = 64, 1024
    rng = np.random.default_rng(7)
    # x=0 makes L == M == Y: the linear output sweeps y densely incl.
    # negatives and >1 out-of-gamut values
    x = np.zeros((h, w), np.float32)
    y = (rng.random((h, w), np.float32) * 1.4 - 0.2).astype(np.float32)
    b = y.copy()
    mat = np.eye(3, dtype=np.float32).reshape(-1)
    biases = np.zeros(3, np.float32)
    dither = np.zeros((32, 32), np.float32)
    out = np.empty((h, w, 3), np.uint8)
    p = native._ptr

    strides = np.array([w, w, w], np.int64)

    def run(kind, p0):
        lib.jxl_xyb_srgb_u8(
            p(x, ctypes.c_float), p(y, ctypes.c_float), p(b, ctypes.c_float),
            p(strides, ctypes.c_int64),
            ctypes.c_int64(h), ctypes.c_int64(w),
            p(mat, ctypes.c_float), p(biases, ctypes.c_float),
            ctypes.c_float(1.0), p(dither, ctypes.c_float),
            ctypes.c_int(kind), ctypes.c_float(p0),
            p(out, ctypes.c_uint8),
        )
        return out.copy()

    lin = (y.astype(np.float64)) ** 3  # xyb with x=0, zero biases

    def srgb(a):
        aa = np.abs(a)
        t = np.where(aa <= 0.0031308, aa * 12.92, 1.055 * aa ** (1 / 2.4) - 0.055)
        return np.sign(a) * t

    def pq(a, p0):
        m1, m2 = 2610 / 16384, 2523 / 4096 * 128
        c1, c2, c3 = 3424 / 4096, 2413 / 4096 * 32, 2392 / 4096 * 32
        aa = np.abs(a) * p0
        ym = aa ** m1
        return np.sign(a) * ((c1 + c2 * ym) / (1 + c3 * ym)) ** m2

    def bt709(a):
        aa = np.abs(a)
        t = np.where(
            aa < 0.018053968510807,
            aa * 4.5,
            1.09929682680944 * aa ** 0.45 - 0.09929682680944,
        )
        return np.sign(a) * t

    cases = [
        (0, 1.0, srgb),
        (1, 0.0255, lambda a: pq(a, 0.0255)),
        (2, 1.0, bt709),
        (3, 0.4545, lambda a: np.sign(a) * np.abs(a) ** 0.4545),
        (4, 0.0, lambda a: a),
    ]
    for kind, p0, fn in cases:
        got = run(kind, p0)
        exact = np.round(np.clip(fn(lin) * 255, 0, 255)).astype(np.int16)
        d = np.abs(got[..., 1].astype(np.int16) - exact)
        assert int(d.max()) <= 1, (kind, int(d.max()))
