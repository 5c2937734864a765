"""Native C++ filter chain (native/filters.cc) vs the numpy oracle
(render/stages/core.py) — same gaborish + EPF math, different loop
structure, must agree to f32 rounding."""

import numpy as np
import pytest

from jxl_tpu.native import filter_chain_native, available
from jxl_tpu.render.stages import core as st


class _Rf:
    epf_iters = 2
    epf_channel_scale = (40.0, 5.0, 3.5)
    epf_pass0_sigma_scale = 0.9
    epf_pass2_sigma_scale = 6.5
    epf_border_sad_mul = 2.0 / 3.0
    epf_sharp_lut = None


GAB = (0.115169525, 0.061248592) * 3


def _mk(h, w, seed=0):
    r = np.random.default_rng(seed)
    planes = [r.normal(size=(h, w)).astype(np.float32) * 0.3 for _ in range(3)]
    inv_sigma = (-1.0 / (0.1 + r.random((h, w), dtype=np.float32))).astype(np.float32)
    # sprinkle passthrough pixels (inv_sigma below MIN_SIGMA)
    mask = r.random((h, w)) < 0.1
    inv_sigma[mask] = np.float32(st.MIN_SIGMA) * 1.5
    return planes, inv_sigma


def _oracle(planes, inv_sigma, gab, iters, rf):
    out = list(planes)
    if gab is not None:
        out = [
            st.gaborish(np, p, gab[2 * c], gab[2 * c + 1])
            for c, p in enumerate(out)
        ]
    if iters >= 3:
        out = st.epf_step_px(np, out, inv_sigma, rf, 0)
    if iters >= 1:
        out = st.epf_step_px(np, out, inv_sigma, rf, 1)
    if iters >= 2:
        out = st.epf_step_px(np, out, inv_sigma, rf, 2)
    return out


@pytest.mark.skipif(not available(), reason="native lib unavailable")
@pytest.mark.parametrize("iters", [0, 1, 2, 3])
@pytest.mark.parametrize("gab", [None, GAB])
def test_filter_chain_matches_oracle(iters, gab):
    if iters == 0 and gab is None:
        return
    rf = _Rf()
    rf.epf_iters = iters
    planes, inv_sigma = _mk(41, 57, seed=iters * 2 + (gab is not None))
    ref = _oracle(planes, inv_sigma, gab, iters, rf)
    got = filter_chain_native(
        planes, inv_sigma if iters else None, gab, iters, rf
    )
    assert got is not None
    for c in range(3):
        np.testing.assert_allclose(got[c], ref[c], rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_filter_chain_odd_sizes():
    rf = _Rf()
    for h, w in [(8, 8), (9, 13), (64, 8), (8, 64), (127, 33)]:
        planes, inv_sigma = _mk(h, w, seed=h * 100 + w)
        ref = _oracle(planes, inv_sigma, GAB, 2, rf)
        got = filter_chain_native(planes, inv_sigma, GAB, 2, rf)
        for c in range(3):
            np.testing.assert_allclose(got[c], ref[c], rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_filter_chain_tiny_falls_back():
    rf = _Rf()
    planes, inv_sigma = _mk(4, 4)
    assert filter_chain_native(planes, inv_sigma, GAB, 2, rf) is None


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_filter_chain_block_sigma():
    """In-kernel block->pixel sigma expansion == _expand_sigma + px mode."""
    rf = _Rf()
    h, w = 41, 57
    r = np.random.default_rng(7)
    planes = [r.normal(size=(h, w)).astype(np.float32) * 0.3 for _ in range(3)]
    sb = (-1.0 / (0.1 + r.random((-(-h // 8), -(-w // 8)), dtype=np.float32))).astype(
        np.float32
    )
    sb[0, 1] = np.float32(st.MIN_SIGMA) * 1.5  # passthrough block
    inv_px = st._expand_sigma(np, sb, h, w, (0, 0))
    ref = filter_chain_native([p.copy() for p in planes], inv_px, GAB, 2, rf)
    got = filter_chain_native(
        [p.copy() for p in planes], sb, GAB, 2, rf, sigma_is_block=True
    )
    for c in range(3):
        np.testing.assert_array_equal(got[c], ref[c])
