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


def test_size_hints_reach_completion():
    """NEED_MORE_INPUT carries a byte hint (ref api/mod.rs:36-54); feeding
    exactly the hinted amount must make progress and finish the decode."""
    data = (CORPUS / "basic.jxl").read_bytes()
    dec = JxlDecoder()
    pos = 0
    rounds = 0
    while True:
        ev = dec.process()
        if ev == Event.COMPLETE:
            break
        if ev == Event.NEED_MORE_INPUT:
            if pos >= len(data):
                dec.end_input()
                continue
            n = dec.bytes_needed or 1
            assert n >= 1
            dec.feed(data[pos : pos + n])
            pos += n
            rounds += 1
            assert rounds < 10_000
    ref = decode_image(data)
    assert np.array_equal(dec.frames[0], ref.frames[0])


def test_progressive_mode_events():
    from jxl_tpu.api.decoder import JxlDecoderOptions, ProgressiveMode

    data = (CORPUS / "green_queen_vardct_e3.jxl").read_bytes()
    events = {}
    for mode in (ProgressiveMode.EAGER, ProgressiveMode.FULL_FRAME):
        dec = JxlDecoder(JxlDecoderOptions(progressive_mode=mode))
        pos, seen = 0, 0
        chunk = 4096
        while True:
            ev = dec.process()
            if ev == Event.COMPLETE:
                break
            if ev == Event.FRAME_PROGRESSION:
                seen += 1
                fl = dec.flush_pixels()
                assert fl is not None
                continue
            if ev == Event.NEED_MORE_INPUT:
                if pos >= len(data):
                    dec.end_input()
                    continue
                dec.feed(data[pos : pos + chunk])
                pos += chunk
        events[mode] = seen
    assert events[ProgressiveMode.EAGER] > 0
    assert events[ProgressiveMode.FULL_FRAME] == 0


@pytest.mark.slow
def test_streaming_chunked_corpus():
    """Chunked decode over every fast-decodable corpus file must match the
    one-shot decode (the analog of the reference's corpus-wide chunks
    tests; chunk sizes chosen to stress resume points)."""
    files = sorted(CORPUS.glob("*.jxl")) + sorted(
        (CORPUS / "conformance_test_images").glob("*.jxl")
    )
    checked = 0
    for path in files:
        if path.name == "invalid_animated_ooo_jxlp.jxl":
            continue
        if path.stat().st_size > 120_000:
            continue  # keep the tier inside CI time
        data = path.read_bytes()
        try:
            ref = decode_image(data)
        except Exception:
            continue
        dec = stream_decode(data, 997)
        assert len(dec.frames) == len(ref.frames), path.name
        for a, b in zip(dec.frames, ref.frames):
            assert np.array_equal(a, b), path.name
        checked += 1
    assert checked >= 40, checked
