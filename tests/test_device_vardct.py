"""Whole-frame device VarDCT render (vardct/device_frame.py) vs the host
per-group path: same math, pixels must match within float tolerance."""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.simple import decode_image
import jxl_tpu.api.frame as F

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


@pytest.mark.parametrize(
    "name",
    ["green_queen_vardct_e3.jxl", "zoltan_tasi_unsplash.jxl"],
)
def test_device_render_matches_host(name):
    path = CORPUS / name
    if not path.exists():
        pytest.skip("corpus not available")
    data = path.read_bytes()
    a = decode_image(data).frames[0]
    orig = F.Frame._maybe_enable_device_render
    F.Frame._maybe_enable_device_render = lambda self: None
    try:
        b = decode_image(data).frames[0]
    finally:
        F.Frame._maybe_enable_device_render = orig
    assert np.abs(a - b).max() < 1e-4
