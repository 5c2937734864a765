"""Independent ground-truth oracle: decode .jxl files with the system
libjxl (C reference implementation, /lib/x86_64-linux-gnu/libjxl.so.0.7)
via ctypes.

Used ONLY by tests/CI as an external verification source (like lcms2 for
ICC): our decoder's output is compared against libjxl's pixels. This is
the same role the libjxl conformance runner plays for the reference
(ref ci/conformance_summary.py:11-42).
"""

from __future__ import annotations

import ctypes
from ctypes import (
    POINTER,
    Structure,
    byref,
    c_char_p,
    c_float,
    c_int,
    c_size_t,
    c_ubyte,
    c_uint8,
    c_uint32,
    c_void_p,
)

import numpy as np

_LIB_PATH = "/lib/x86_64-linux-gnu/libjxl.so.0.7"

# JxlDecoderStatus
JXL_DEC_SUCCESS = 0
JXL_DEC_ERROR = 1
JXL_DEC_NEED_MORE_INPUT = 2
JXL_DEC_NEED_PREVIEW_OUT_BUFFER = 3
JXL_DEC_NEED_DC_OUT_BUFFER = 4
JXL_DEC_NEED_IMAGE_OUT_BUFFER = 5
JXL_DEC_JPEG_NEED_MORE_OUTPUT = 6
JXL_DEC_BOX_NEED_MORE_OUTPUT = 7
JXL_DEC_BASIC_INFO = 0x40
JXL_DEC_EXTENSIONS = 0x80
JXL_DEC_COLOR_ENCODING = 0x100
JXL_DEC_PREVIEW_IMAGE = 0x200
JXL_DEC_FRAME = 0x400
JXL_DEC_DC_IMAGE = 0x800
JXL_DEC_FULL_IMAGE = 0x1000

JXL_TYPE_FLOAT = 0
JXL_LITTLE_ENDIAN = 1


class JxlPixelFormat(Structure):
    _fields_ = [
        ("num_channels", c_uint32),
        ("data_type", c_int),
        ("endianness", c_int),
        ("align", c_size_t),
    ]


class JxlColorEncoding(Structure):
    _fields_ = [
        ("color_space", c_int),
        ("white_point", c_int),
        ("white_point_xy", ctypes.c_double * 2),
        ("primaries", c_int),
        ("primaries_red_xy", ctypes.c_double * 2),
        ("primaries_green_xy", ctypes.c_double * 2),
        ("primaries_blue_xy", ctypes.c_double * 2),
        ("transfer_function", c_int),
        ("gamma", ctypes.c_double),
        ("rendering_intent", c_int),
    ]


class JxlPreviewHeader(Structure):
    _fields_ = [("xsize", c_uint32), ("ysize", c_uint32)]


class JxlAnimationHeader(Structure):
    _fields_ = [
        ("tps_numerator", c_uint32),
        ("tps_denominator", c_uint32),
        ("num_loops", c_uint32),
        ("have_timecodes", c_int),
    ]


class JxlBasicInfo(Structure):
    # layout of libjxl 0.7's JxlBasicInfo (codec.h)
    _fields_ = [
        ("have_container", c_int),
        ("xsize", c_uint32),
        ("ysize", c_uint32),
        ("bits_per_sample", c_uint32),
        ("exponent_bits_per_sample", c_uint32),
        ("intensity_target", c_float),
        ("min_nits", c_float),
        ("relative_to_max_display", c_int),
        ("linear_below", c_float),
        ("uses_original_profile", c_int),
        ("have_preview", c_int),
        ("have_animation", c_int),
        ("orientation", c_int),
        ("num_color_channels", c_uint32),
        ("num_extra_channels", c_uint32),
        ("alpha_bits", c_uint32),
        ("alpha_exponent_bits", c_uint32),
        ("alpha_premultiplied", c_int),
        ("preview", JxlPreviewHeader),
        ("animation", JxlAnimationHeader),
        ("intrinsic_xsize", c_uint32),
        ("intrinsic_ysize", c_uint32),
        ("padding", c_uint8 * 100),
    ]


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.JxlDecoderCreate.restype = c_void_p
        lib.JxlDecoderCreate.argtypes = [c_void_p]
        lib.JxlDecoderDestroy.argtypes = [c_void_p]
        lib.JxlDecoderSubscribeEvents.argtypes = [c_void_p, c_int]
        lib.JxlDecoderSetInput.argtypes = [c_void_p, c_char_p, c_size_t]
        lib.JxlDecoderCloseInput.argtypes = [c_void_p]
        lib.JxlDecoderProcessInput.argtypes = [c_void_p]
        lib.JxlDecoderGetBasicInfo.argtypes = [c_void_p, POINTER(JxlBasicInfo)]
        lib.JxlDecoderImageOutBufferSize.argtypes = [
            c_void_p,
            POINTER(JxlPixelFormat),
            POINTER(c_size_t),
        ]
        lib.JxlDecoderSetImageOutBuffer.argtypes = [
            c_void_p,
            POINTER(JxlPixelFormat),
            c_void_p,
            c_size_t,
        ]
        try:
            lib.JxlDecoderSetRenderSpotcolors.argtypes = [c_void_p, c_int]
        except AttributeError:
            pass
        try:
            lib.JxlDecoderSetCoalescing.argtypes = [c_void_p, c_int]
        except AttributeError:
            pass
        lib.JxlDecoderSetPreferredColorProfile.argtypes = [
            c_void_p,
            POINTER(JxlColorEncoding),
        ]
        lib.JxlColorEncodingSetToSRGB.argtypes = [POINTER(JxlColorEncoding), c_int]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except OSError:
        return False


def decode_partial(
    data: bytes, nbytes: int, num_channels: int = 4, prefer_srgb: bool = True
):
    """Feed libjxl a prefix of `data` and flush: returns its progressive
    partial image ((H, W, C) f32) — the authoritative flush-quality
    baseline (libjxl JxlDecoderFlushImage)."""
    lib = get_lib()
    lib.JxlDecoderFlushImage.argtypes = [c_void_p]
    dec = lib.JxlDecoderCreate(None)
    if not dec:
        raise RuntimeError("JxlDecoderCreate failed")
    try:
        ev = JXL_DEC_BASIC_INFO | JXL_DEC_FULL_IMAGE | JXL_DEC_COLOR_ENCODING
        lib.JxlDecoderSubscribeEvents(dec, ev)
        buf_in = ctypes.create_string_buffer(data[:nbytes], nbytes)
        lib.JxlDecoderSetInput(dec, ctypes.cast(buf_in, c_char_p), nbytes)
        lib.JxlDecoderCloseInput(dec)
        info = JxlBasicInfo()
        out = None
        fmt = None
        while True:
            st = lib.JxlDecoderProcessInput(dec)
            if st == JXL_DEC_BASIC_INFO:
                lib.JxlDecoderGetBasicInfo(dec, byref(info))
                fmt = JxlPixelFormat(
                    num_channels, JXL_TYPE_FLOAT, JXL_LITTLE_ENDIAN, 0
                )
            elif st == JXL_DEC_COLOR_ENCODING:
                if prefer_srgb:
                    enc = JxlColorEncoding()
                    lib.JxlColorEncodingSetToSRGB(
                        byref(enc), 1 if info.num_color_channels == 1 else 0
                    )
                    lib.JxlDecoderSetPreferredColorProfile(dec, byref(enc))
            elif st == JXL_DEC_NEED_IMAGE_OUT_BUFFER:
                size = c_size_t(0)
                lib.JxlDecoderImageOutBufferSize(dec, byref(fmt), byref(size))
                out = np.zeros(size.value // 4, dtype=np.float32)
                lib.JxlDecoderSetImageOutBuffer(
                    dec, byref(fmt), out.ctypes.data_as(c_void_p), size.value
                )
            elif st in (JXL_DEC_NEED_MORE_INPUT, JXL_DEC_SUCCESS, JXL_DEC_ERROR):
                lib.JxlDecoderFlushImage(dec)
                break
            elif st == JXL_DEC_FULL_IMAGE:
                pass
        if out is None:
            return None
        return out.reshape(info.ysize, info.xsize, num_channels).copy()
    finally:
        lib.JxlDecoderDestroy(dec)


def decode_ref(
    data: bytes, num_channels: int | None = None, prefer_srgb: bool = False
):
    """Decode with libjxl; returns (frames, info) where frames is a list of
    (H, W, C) float32 arrays in the image's nominal color space (orientation
    applied, spot colors rendered — matching our decoder defaults).

    With prefer_srgb, libjxl is asked to output sRGB (gray images: gray
    sRGB TF) regardless of any embedded ICC profile — this matches our
    decoder's output space for xyb_encoded images whose color is described
    only by an ICC profile (ref xyb.rs:65-75 srgb_output)."""
    lib = get_lib()
    dec = lib.JxlDecoderCreate(None)
    if not dec:
        raise RuntimeError("JxlDecoderCreate failed")
    try:
        ev = JXL_DEC_BASIC_INFO | JXL_DEC_FULL_IMAGE | JXL_DEC_COLOR_ENCODING
        if lib.JxlDecoderSubscribeEvents(dec, ev) != JXL_DEC_SUCCESS:
            raise RuntimeError("SubscribeEvents failed")
        buf_in = ctypes.create_string_buffer(data, len(data))
        if lib.JxlDecoderSetInput(dec, ctypes.cast(buf_in, c_char_p), len(data)) != JXL_DEC_SUCCESS:
            raise RuntimeError("SetInput failed")
        lib.JxlDecoderCloseInput(dec)

        info = JxlBasicInfo()
        frames = []
        out = None
        fmt = None
        while True:
            status = lib.JxlDecoderProcessInput(dec)
            if status == JXL_DEC_ERROR:
                raise RuntimeError("libjxl decode error")
            if status == JXL_DEC_NEED_MORE_INPUT:
                raise RuntimeError("libjxl needs more input (truncated?)")
            if status == JXL_DEC_BASIC_INFO:
                if lib.JxlDecoderGetBasicInfo(dec, byref(info)) != JXL_DEC_SUCCESS:
                    raise RuntimeError("GetBasicInfo failed")
                nc = num_channels
                if nc is None:
                    nc = info.num_color_channels + (1 if info.alpha_bits > 0 else 0)
                fmt = JxlPixelFormat(nc, JXL_TYPE_FLOAT, JXL_LITTLE_ENDIAN, 0)
            elif status == JXL_DEC_COLOR_ENCODING:
                if prefer_srgb:
                    enc = JxlColorEncoding()
                    lib.JxlColorEncodingSetToSRGB(
                        byref(enc), 1 if info.num_color_channels == 1 else 0
                    )
                    lib.JxlDecoderSetPreferredColorProfile(dec, byref(enc))
            elif status == JXL_DEC_NEED_IMAGE_OUT_BUFFER:
                size = c_size_t(0)
                if lib.JxlDecoderImageOutBufferSize(dec, byref(fmt), byref(size)) != JXL_DEC_SUCCESS:
                    raise RuntimeError("ImageOutBufferSize failed")
                out = np.empty(size.value // 4, dtype=np.float32)
                if (
                    lib.JxlDecoderSetImageOutBuffer(
                        dec, byref(fmt), out.ctypes.data_as(c_void_p), size.value
                    )
                    != JXL_DEC_SUCCESS
                ):
                    raise RuntimeError("SetImageOutBuffer failed")
            elif status == JXL_DEC_FULL_IMAGE:
                # orientation is applied by default: output dims are the
                # oriented ones
                w, h = info.xsize, info.ysize
                if info.orientation >= 5:
                    w, h = info.ysize, info.xsize
                    w, h = info.xsize, info.ysize  # xsize/ysize already oriented
                frames.append(out.reshape(info.ysize, info.xsize, fmt.num_channels).copy())
            elif status == JXL_DEC_SUCCESS:
                break
        return frames, info
    finally:
        lib.JxlDecoderDestroy(dec)
