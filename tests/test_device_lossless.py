"""Device wavefront reconstruction for gradient-only lossless Modular
(modular/device_lossless.py): bit-identical to the host C++ loop, the
reference's pipeline-equivalence discipline (ref tests/macros.rs:38-47)."""

import os

import numpy as np
import pytest

from jxl_tpu import native
from jxl_tpu.api.simple import decode_image


def _decode(data, mode):
    os.environ["JXL_TPU_DEV_LOSSLESS"] = mode
    try:
        return decode_image(data, pixel_format="u8")
    finally:
        os.environ.pop("JXL_TPU_DEV_LOSSLESS", None)


# -- wavefront program vs native reconstruction (unit level) ------------


@pytest.mark.parametrize(
    "h,w",
    [(1, 1), (1, 7), (5, 1), (3, 3), (13, 29), (64, 64), (128, 37), (256, 256)],
)
def test_wavefront_matches_native(h, w):
    from jxl_tpu.modular.device_lossless import _program, _pow2ceil

    rng = np.random.default_rng(h * 1000 + w)
    res = rng.integers(-(1 << 18), 1 << 18, size=(h, w), dtype=np.int32)
    ref = res.copy()
    native.gradient_reconstruct(ref)
    H, W = _pow2ceil(h), _pow2ceil(w)
    batch = np.zeros((8, H, W), np.int32)
    batch[0, :h, :w] = res
    out = np.asarray(_program(8, H, W, "int32")(batch))
    np.testing.assert_array_equal(out[0, :h, :w], ref)


def test_wavefront_extreme_residuals_at_gate():
    """Residuals just inside the magnitude gate stay int32-exact."""
    from jxl_tpu.modular.device_lossless import MAX_RESIDUAL, _program

    rng = np.random.default_rng(7)
    lim = MAX_RESIDUAL - 1
    res = rng.choice([-lim, lim], size=(64, 64)).astype(np.int32)
    ref = res.copy()
    native.gradient_reconstruct(ref)
    batch = res[None].astype(np.int32)
    out = np.asarray(_program(1, 64, 64, "int32")(batch))
    np.testing.assert_array_equal(out[0], ref)


def test_gradient_reconstruct_row_slice_stride():
    """The native helper honors row strides (views into larger planes)."""
    rng = np.random.default_rng(3)
    plane = rng.integers(-100, 100, size=(16, 32), dtype=np.int32)
    view = plane[:, 4:20]
    compact = np.ascontiguousarray(view)
    native.gradient_reconstruct(view)
    native.gradient_reconstruct(compact)
    np.testing.assert_array_equal(view, compact)


# -- end-to-end bit-exactness -------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["strategic_solid_blue.jxl", "conformance_test_images/bike.jxl"],
)
def test_device_lossless_bitexact(corpus_dir, name):
    data = (corpus_dir / name).read_bytes()
    ref = _decode(data, "0")
    got = _decode(data, "1")
    assert len(ref.frames) == len(got.frames)
    for a, b in zip(ref.frames, got.frames):
        np.testing.assert_array_equal(a, b)


def test_ineligible_streams_unaffected(corpus_dir):
    """Non-gradient trees (green_queen uses a WP tree) decode through
    the normal path with a batch context active — byte-identical."""
    data = (corpus_dir / "green_queen_modular_e3.jxl").read_bytes()
    ref = _decode(data, "0")
    got = _decode(data, "1")
    np.testing.assert_array_equal(ref.frames[0], got.frames[0])


def test_fallback_on_device_error(corpus_dir, monkeypatch):
    """Device failures fall back to native reconstruction, still exact."""
    data = (corpus_dir / "strategic_solid_blue.jxl").read_bytes()
    ref = _decode(data, "0")

    import jxl_tpu.modular.device_lossless as dl

    def boom(L, H, W, dtype):
        raise RuntimeError("simulated device failure")

    monkeypatch.setattr(dl, "_program", boom)
    got = _decode(data, "1")
    np.testing.assert_array_equal(ref.frames[0], got.frames[0])


@pytest.mark.slow
def test_device_lossless_bitexact_large(corpus_dir):
    data = (corpus_dir / "issue728_minimal.jxl").read_bytes()
    ref = _decode(data, "0")
    got = _decode(data, "1")
    np.testing.assert_array_equal(ref.frames[0], got.frames[0])
