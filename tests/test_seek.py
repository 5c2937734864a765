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


@pytest.mark.slow
def test_lf_preview():
    """An lf_level-1 frame yields a 1/8-scale preview before main-frame
    sections (ref frame/lf_preview.rs:279)."""
    import numpy as np

    from jxl_tpu.api.decoder import Event, JxlDecoder

    data = (CORPUS / "conformance_test_images/progressive.jxl").read_bytes()
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    preview = None
    while True:
        ev = d.process()
        if preview is None and d.lf_preview() is not None:
            preview = d.lf_preview()
        if ev is Event.COMPLETE:
            break
    assert preview is not None
    H, W, _ = d.frames[0].shape
    assert preview.shape == (-(-H // 8), -(-W // 8), 3)
    assert np.isfinite(preview).all()
    # the preview approximates the 8x box-downsampled final image
    ph, pw = preview.shape[:2]
    crop = d.frames[0][: ph * 8 - 8, : pw * 8 - 8, :3]
    ds = crop.reshape(ph - 1, 8, pw - 1, 8, 3).mean(axis=(1, 3))
    mse = float(np.mean((preview[: ph - 1, : pw - 1] - ds) ** 2))
    assert mse < 0.01, mse
