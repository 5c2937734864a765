"""Device reconstruction lanes for channel-static lossless Modular
(modular/device_lossless.py): bit-identical to the host loops, the
reference's pipeline-equivalence discipline (ref tests/macros.rs:38-47)."""

import os

import numpy as np
import pytest

from jxl_tpu import native
from jxl_tpu.api.simple import decode_image
from jxl_tpu.modular.device_lossless import (
    _PRED_GRADIENT,
    _PRED_NORTH,
    _PRED_WEST,
    _pow2ceil,
    _program,
    _reconstruct_host,
)


def _decode(data, mode):
    os.environ["JXL_TPU_DEV_LOSSLESS"] = mode
    try:
        return decode_image(data, pixel_format="u8")
    finally:
        os.environ.pop("JXL_TPU_DEV_LOSSLESS", None)


def _oracle_west_north(res, pred):
    """Scalar oracle replicating decode.py's neighborhood semantics for
    the West and North static predictors (wrap_i32 at every step)."""
    h, w = res.shape
    v = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            left = v[y, x - 1] if x > 0 else (v[y - 1, 0] if y > 0 else 0)
            top = v[y - 1, x] if y > 0 else left
            g = int(left) if pred == _PRED_WEST else int(top)
            v[y, x] = ((g + int(res[y, x]) + (1 << 31)) % (1 << 32)) - (1 << 31)
    return v.astype(np.int32)


# -- device programs vs oracles (unit level) ------------------------------


@pytest.mark.parametrize(
    "h,w",
    [(1, 1), (1, 7), (5, 1), (3, 3), (13, 29), (64, 64), (128, 37), (256, 256)],
)
def test_wavefront_matches_native(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    res = rng.integers(-(1 << 18), 1 << 18, size=(h, w), dtype=np.int32)
    ref = res.copy()
    native.gradient_reconstruct(ref)
    H, W = _pow2ceil(h), _pow2ceil(w)
    batch = np.zeros((8, H, W), np.int32)
    batch[0, :h, :w] = res
    out = np.asarray(_program(_PRED_GRADIENT, 8, H, W, "int32")(batch))
    np.testing.assert_array_equal(out[0, :h, :w], ref)


@pytest.mark.parametrize("pred", [_PRED_WEST, _PRED_NORTH])
@pytest.mark.parametrize("h,w", [(1, 5), (5, 1), (7, 13), (32, 32)])
def test_cumsum_lanes_match_oracle(pred, h, w):
    rng = np.random.default_rng(pred * 100 + h * 10 + w)
    res = rng.integers(-(1 << 20), 1 << 20, size=(h, w), dtype=np.int32)
    ref = _oracle_west_north(res, pred)
    H, W = _pow2ceil(h), _pow2ceil(w)
    batch = np.zeros((8, H, W), np.int32)
    batch[0, :h, :w] = res
    out = np.asarray(_program(pred, 8, H, W, "int32")(batch))
    np.testing.assert_array_equal(out[0, :h, :w], ref)
    host = res.copy()
    _reconstruct_host(host, pred)
    np.testing.assert_array_equal(host, ref)


@pytest.mark.parametrize("pred", [_PRED_WEST, _PRED_NORTH])
def test_cumsum_lanes_wraparound_exact(pred):
    """int32 overflow wraps identically on device, numpy, and the scalar
    oracle — the cumsum lanes need no magnitude gate."""
    rng = np.random.default_rng(pred)
    res = rng.choice([-(1 << 30), 1 << 30, 1 << 29], size=(16, 16)).astype(
        np.int32
    )
    ref = _oracle_west_north(res, pred)
    out = np.asarray(_program(pred, 1, 16, 16, "int32")(res[None]))
    np.testing.assert_array_equal(out[0], ref)
    host = res.copy()
    _reconstruct_host(host, pred)
    np.testing.assert_array_equal(host, ref)


def test_wavefront_extreme_residuals_at_gate():
    """Residuals just inside the dynamic magnitude gate stay int32-exact."""
    rng = np.random.default_rng(7)
    lim = (1 << 31) // (3 * (64 + 64 - 1)) - 1
    res = rng.choice([-lim, lim], size=(64, 64)).astype(np.int32)
    ref = res.copy()
    native.gradient_reconstruct(ref)
    batch = res[None].astype(np.int32)
    out = np.asarray(_program(_PRED_GRADIENT, 1, 64, 64, "int32")(batch))
    np.testing.assert_array_equal(out[0], ref)


def test_large_dim_lane():
    """Channels past the old 512-px cap run on the (memory-capped) lane."""
    rng = np.random.default_rng(11)
    h, w = 1024, 640
    res = rng.integers(-255, 256, size=(h, w), dtype=np.int32)
    ref = res.copy()
    native.gradient_reconstruct(ref)
    H, W = _pow2ceil(h), _pow2ceil(w)
    batch = np.zeros((8, H, W), np.int32)
    batch[0, :h, :w] = res
    out = np.asarray(_program(_PRED_GRADIENT, 8, H, W, "int32")(batch))
    np.testing.assert_array_equal(out[0, :h, :w], ref)


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
    """WP trees (green_queen) stay on the normal path with a batch
    context active — byte-identical."""
    data = (corpus_dir / "green_queen_modular_e3.jxl").read_bytes()
    ref = _decode(data, "0")
    got = _decode(data, "1")
    np.testing.assert_array_equal(ref.frames[0], got.frames[0])


def test_fallback_on_device_error(corpus_dir, monkeypatch):
    """Device failures fall back to native reconstruction, still exact."""
    data = (corpus_dir / "strategic_solid_blue.jxl").read_bytes()
    ref = _decode(data, "0")

    import jxl_tpu.modular.device_lossless as dl

    def boom(kind, L, H, W, dtype):
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
