"""Device patches stage (render/pipeline.py patches_stage dense layers):
masked whole-image blends must reproduce the sequential per-patch host
dictionary bit-exactly, including overlapping dictionaries (layering)."""

import os

import numpy as np
import pytest

from jxl_tpu.api.simple import decode_image


_PATCH_FILES = [
    "grayscale_patches_modular.jxl",
    "grayscale_patches_var_dct.jxl",
    "small_grayscale_patches_modular.jxl",
    "conformance_test_images/patches.jxl",  # 654 patches, overlapping
]


@pytest.mark.parametrize("name", _PATCH_FILES)
def test_dense_layers_match_sequential(corpus_dir, name, monkeypatch):
    """Dense-layer blending == sequential pd.apply (host, bit-exact)."""
    import jxl_tpu.render.pipeline as pl

    data = (corpus_dir / name).read_bytes()
    os.environ["JXL_TPU_DEVICE"] = "off"
    try:
        orig = pl._dense_patch_layers
        monkeypatch.setattr(pl, "_dense_patch_layers", lambda *a, **k: None)
        ref = decode_image(data, pixel_format="u8").frames[0]
        monkeypatch.setattr(pl, "_dense_patch_layers", orig)
        got = decode_image(data, pixel_format="u8").frames[0]
    finally:
        os.environ.pop("JXL_TPU_DEVICE", None)
    np.testing.assert_array_equal(ref, got)


def test_patches_stage_is_device_ok(corpus_dir):
    """Uniform-descriptor dictionaries build the device stage, so patch
    frames join fused device spans (render/batch eligibility)."""
    from jxl_tpu.api import simple as api_simple
    import jxl_tpu.render.pipeline as pl

    seen = {}
    orig = pl.patches_stage

    def spy(frame, num_ec, ctx=None):
        st = orig(frame, num_ec, ctx)
        seen[frame.header.size()] = st.device_ok
        return st

    pl.patches_stage = spy
    try:
        data = (corpus_dir / "grayscale_patches_var_dct.jxl").read_bytes()
        os.environ["JXL_TPU_DEVICE"] = "off"
        decode_image(data, pixel_format="u8")
    finally:
        pl.patches_stage = orig
        os.environ.pop("JXL_TPU_DEVICE", None)
    assert seen and all(seen.values())


def test_patches_device_span(corpus_dir):
    """The full fused device span with the patches stage matches the
    host pipeline (grayscale_patches_var_dct is exact on the CPU mesh)."""
    data = (corpus_dir / "grayscale_patches_var_dct.jxl").read_bytes()
    os.environ["JXL_TPU_DEVICE"] = "off"
    try:
        ref = decode_image(data, pixel_format="u8").frames[0]
    finally:
        os.environ.pop("JXL_TPU_DEVICE", None)
    os.environ["JXL_TPU_DEVICE"] = "on"
    try:
        got = decode_image(data, pixel_format="u8").frames[0]
    finally:
        os.environ.pop("JXL_TPU_DEVICE", None)
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32)).max()
    assert diff <= 1  # device filter-chain rounding, pre-existing bound
