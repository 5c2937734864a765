"""VarDCT end-to-end tests: cross-validation between the independent
Modular and VarDCT decode paths, plus pixel goldens for the 3x3 pattern."""

import pathlib

import numpy as np
import pytest

from jxl_tpu.api.simple import decode_first_frame
from jxl_tpu.render.simple import render_frame

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def decode_render(name):
    df = decode_first_frame((CORPUS / name).read_bytes())
    return df, render_frame(df.frame)


def psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return -10 * np.log10(mse) if mse > 0 else np.inf


def test_3x3_lossy_matches_lossless():
    ref = decode_first_frame((CORPUS / "3x3_srgb_lossless.jxl").read_bytes())
    ref_rgb = np.stack([ch / 255.0 for ch in ref.channels], axis=-1)
    _, out = decode_render("3x3_srgb_lossy.jxl")
    assert out.shape == (3, 3, 3)
    assert psnr(out, ref_rgb) > 30.0


def test_basic_vardct():
    df, out = decode_render("basic.jxl")
    # 1x1 image; values must be finite and in a plausible display range
    assert out.shape == (1, 1, 3)
    assert np.all(np.isfinite(out))
    assert float(np.abs(out).max()) < 4.0


@pytest.mark.slow
def test_green_queen_cross_codec():
    _, rm = decode_render("green_queen_modular_e3.jxl")
    _, rv = decode_render("green_queen_vardct_e3.jxl")
    assert psnr(rm, rv) > 35.0


def test_solid_blue():
    _, out = decode_render("strategic_solid_blue.jxl")
    assert np.allclose(out.reshape(-1, 3).mean(0), [0, 0, 1], atol=1e-3)
