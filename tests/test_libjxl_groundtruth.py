"""Pixel-level ground truth: our decode vs the system libjxl.

The C reference implementation (libjxl.so, the same decoder that
generates the official conformance corpus outputs) decodes every corpus
file; our frames must match within tight f32 tolerance. This is the
everything-on-every-file discipline of the reference's conformance gate
(ref ci/conformance_summary.py:11-42) run entirely in-process.

Comparison space: sRGB-forced for ICC-described XYB images (matching our
and jxl-rs's output space for those files, ref xyb.rs:65-75
srgb_output); the image's native space otherwise. libjxl clamps negative
linear values to 0 (we, like jxl-rs, preserve them), so both sides are
clamped at 0 before comparison.
"""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.decoder import Event, JxlDecoder
from jxl_tpu.io.headers import ExtraChannel

from libjxl_ref import available, decode_ref

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")

EXPECT_FAIL = {"invalid_animated_ooo_jxlp.jxl"}

# f32 accumulation-order differences; the worst corpus file
# (multiple_layers_noise_spline: upsampled noise layer + splines) sits at
# 6.3e-7
MSE_TOL = 1e-6

ALL_FILES = sorted(
    str(p.relative_to(CORPUS))
    for p in list(CORPUS.glob("*.jxl"))
    + list(CORPUS.glob("conformance_test_images/*.jxl"))
    if p.name not in EXPECT_FAIL
)
FAST_FILES = [f for f in ALL_FILES if (CORPUS / f).stat().st_size <= 60_000]
SLOW_FILES = [f for f in ALL_FILES if f not in FAST_FILES]


def _check(name: str):
    if not available():
        pytest.skip("libjxl not available")
    path = CORPUS / name
    data = path.read_bytes()
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    meta = d.file_header.image_metadata
    want_srgb = meta.color_encoding.want_icc and meta.xyb_encoded
    refs, info = decode_ref(data, prefer_srgb=want_srgb)
    assert len(refs) == len(d.frames), (len(refs), len(d.frames))
    alpha_idx = next(
        (
            i
            for i, e in enumerate(meta.extra_channel_info)
            if e.ec_type == ExtraChannel.ALPHA
        ),
        None,
    )
    for fi, (ours, ref) in enumerate(zip(d.frames, refs)):
        assert ours.shape[:2] == ref.shape[:2]
        if info.num_color_channels == 1:
            pairs = [(0, 0)]
            if ref.shape[-1] > 1 and alpha_idx is not None:
                pairs.append((3 + alpha_idx, 1))
        else:
            pairs = [(c, c) for c in range(min(3, ref.shape[-1]))]
            if ref.shape[-1] > 3 and alpha_idx is not None:
                pairs.append((3 + alpha_idx, 3))
        for oc, rc in pairs:
            a = np.maximum(ours[..., oc].astype(np.float32), 0.0)
            b = np.maximum(ref[..., rc], 0.0)
            mse = float(((a - b) ** 2).mean())
            assert mse < MSE_TOL, f"{name} frame {fi} chan {oc}: mse={mse}"


@pytest.mark.parametrize("name", FAST_FILES)
def test_libjxl_groundtruth(name):
    _check(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW_FILES)
def test_libjxl_groundtruth_slow(name):
    _check(name)
