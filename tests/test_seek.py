"""Frame scan + seek (ref api/decoder.rs VisibleFrameInfo/start_new_frame,
frame_scan_info.rs keyframe dependency analysis)."""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.decoder import Event, JxlDecoder, JxlDecoderOptions

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def decode_full(data):
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    return d


def scan(data):
    d = JxlDecoder(JxlDecoderOptions(scan_frames_only=True))
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    return d


def seek_and_decode_one(d, target):
    d.start_new_frame(target.seek_target)
    while True:
        ev = d.process()
        if ev is Event.FRAME_DONE and d.frames:
            return d.frames[0]
        if ev is Event.COMPLETE:
            return d.frames[0] if d.frames else None


@pytest.mark.parametrize(
    "name,idx",
    [
        ("conformance_test_images/animation_icos4d.jxl", 3),
        ("conformance_test_images/animation_newtons_cradle.jxl", 5),
    ],
)
def test_seek_matches_full_decode(name, idx):
    path = CORPUS / name
    if not path.exists():
        pytest.skip("corpus not available")
    data = path.read_bytes()
    full = decode_full(data)
    d = scan(data)
    infos = d.scanned_frames
    assert len(infos) == len(full.frames)
    assert infos == full.scanned_frames  # scan mode == decode mode scan info
    target = infos[idx]
    assert target.seek_target.decode_start_offset >= 0
    got = seek_and_decode_one(d, target)
    assert np.array_equal(got, full.frames[idx])


def test_scan_records_durations():
    path = CORPUS / "conformance_test_images/animation_icos4d.jxl"
    if not path.exists():
        pytest.skip("corpus not available")
    d = scan(path.read_bytes())
    assert all(f.duration_ms > 0 for f in d.scanned_frames[:-1])
    assert d.scanned_frames[-1].is_last
