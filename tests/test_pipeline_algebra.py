"""Stage algebra: builder output, BORDER/SHIFT metadata, halo calculator.

Mirrors the reference's stage/border expectations (render/mod.rs:29-37
MAX_BORDER, low_memory_pipeline/mod.rs:184-200 border back-propagation).
"""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.decoder import Event, JxlDecoder
from jxl_tpu.render.pipeline import (
    Stage,
    build_render_pipeline,
    device_spans,
    pipeline_key,
    run_stages,
    total_border,
)

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def _decode_frame(name, stop_after_lf=False):
    data = (CORPUS / name).read_bytes()
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    return d.frame


def test_total_border_plain_filters():
    # gaborish(1) + epf1(2) + epf2(1) with no shifts: borders add
    mk = lambda name, b, s: Stage(name, lambda xp, c, ctx: c, border=b, shift=s)
    stages = [mk("gab", (1, 1), (0, 0)), mk("epf1", (2, 2), (0, 0)), mk("epf2", (1, 1), (0, 0))]
    assert total_border(stages) == (4, 4)


def test_total_border_with_shift():
    # an 8x upsample stage (border 2, shift 3) after filters: the
    # downstream border requirement divides by 8 before adding
    mk = lambda name, b, s: Stage(name, lambda xp, c, ctx: c, border=b, shift=s)
    stages = [
        mk("up8", (2, 2), (3, 3)),
        mk("noise", (2, 2), (0, 0)),
    ]
    # noise needs 2 at output res -> ceil(2/8)=1 before up8 -> +2 = 3
    assert total_border(stages) == (3, 3)


def test_builder_vardct_epf_frame():
    fr = _decode_frame("green_queen_vardct_e3.jxl")
    stages, ctx = build_render_pipeline(fr)
    names = [s.name for s in stages]
    assert "gaborish" in names or any(n.startswith("epf") for n in names)
    # crop to visible precedes the first filter
    i_crop = names.index("crop")
    i_filt = min(
        (i for i, n in enumerate(names) if n == "gaborish" or n.startswith("epf")),
        default=len(names),
    )
    assert i_crop < i_filt
    # vardct EPF sigma rides in ctx (not closures) for cache-safe jit
    if any(n.startswith("epf") for n in names):
        assert "sigma_block" in ctx
    # metadata present and hashable
    hash(pipeline_key(stages))
    assert total_border(stages) >= (0, 0)


def test_builder_feature_frame_device_spans():
    fr = _decode_frame("conformance_test_images/noise.jxl")
    stages, ctx = build_render_pipeline(fr)
    names = [s.name for s in stages]
    assert names[-1] == "noise"
    assert ctx.get("needs_noise_field")
    # the noise stage is device-eligible: the whole list forms one span
    spans = device_spans(stages)
    assert all(is_dev for is_dev, _ in spans), [
        (s.name, s.device_ok) for s in stages
    ]


def test_builder_oracle_matches_legacy_flush_path():
    # run_stages(np) over the built pipeline must reproduce the decoder's
    # own render for a feature-rich frame
    name = "conformance_test_images/noise.jxl"
    data = (CORPUS / name).read_bytes()
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    from jxl_tpu.render.simple import color_transform, render_frame_channels_ex

    fr = d.frame
    a, cd_a, _ = render_frame_channels_ex(fr, fuse=False)
    b, cd_b, _ = render_frame_channels_ex(fr, fuse=True)
    if cd_b and not cd_a:
        a = color_transform(fr, a)
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(pa, pb, rtol=0, atol=2e-5)
