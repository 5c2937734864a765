"""Streaming API tests: byte-at-a-time resume must match one-shot decode
(the analog of ref test_decode_test_file_chunks_*)."""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.decoder import Event, JxlDecoder
from jxl_tpu.api.simple import decode_image

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")

FILES = [
    "3x3_srgb_lossless.jxl",
    "basic.jxl",
    "has_permutation.jxl",
    "with_icc.jxl",
    "gray_alpha_lossless.jxl",
    "has_permutation_with_container.jxl",
]


def stream_decode(data: bytes, chunk: int) -> JxlDecoder:
    dec = JxlDecoder()
    pos = 0
    while True:
        ev = dec.process()
        if ev == Event.NEED_MORE_INPUT:
            if pos >= len(data):
                dec.end_input()
                continue
            dec.feed(data[pos : pos + chunk])
            pos += chunk
            continue
        if ev == Event.COMPLETE:
            return dec


@pytest.mark.parametrize("name", FILES)
@pytest.mark.parametrize("chunk", [1, 7])
def test_streaming_matches_oneshot(name, chunk):
    data = (CORPUS / name).read_bytes()
    ref = decode_image(data)
    dec = stream_decode(data, chunk)
    assert len(dec.frames) == len(ref.frames)
    for a, b in zip(dec.frames, ref.frames):
        assert np.array_equal(a, b)


def test_image_info_event():
    data = (CORPUS / "basic.jxl").read_bytes()
    dec = JxlDecoder()
    dec.feed(data)
    ev = dec.process()
    assert ev == Event.IMAGE_INFO
    assert dec.image_info.width == 1 and dec.image_info.height == 1


def test_scan_frames_only():
    from jxl_tpu.api.decoder import JxlDecoderOptions

    data = (CORPUS / "basic.jxl").read_bytes()
    dec = JxlDecoder(JxlDecoderOptions(scan_frames_only=True))
    dec.feed(data)
    while True:
        ev = dec.process()
        if ev == Event.COMPLETE:
            break
    assert len(dec.frame_infos) == 1
    assert dec.frames == []
