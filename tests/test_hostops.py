"""Native host ops (hostops.cc): fused RCT, interleave, scaled i32->f32.

Each op is verified against the numpy semantics it replaces (the numpy
forms are the oracle twins kept in modular/transforms.py apply_rct and
render/simple.py _modular_to_f32). Ref: transforms/rct.rs:18-50,
render/stages/convert.rs:345-.
"""

import numpy as np
import pytest

from jxl_tpu import native
from jxl_tpu.modular.transforms import _RCT_PERM


def _rct_oracle(ins, op, perm):
    v0, v1, v2 = [x.astype(np.int32, copy=True) for x in ins]
    with np.errstate(over="ignore"):
        if op == 1:
            v2 = v2 + v0
        elif op == 2:
            v1 = v1 + v0
        elif op == 3:
            v1 = v1 + v0
            v2 = v2 + v0
        elif op == 4:
            v1 = v1 + ((v0 + v2) >> 1)
        elif op == 5:
            v2 = v2 + v0
            v1 = v1 + ((v0 + v2) >> 1)
        elif op == 6:
            y, co, cg = v0, v1, v2
            y = y - (cg >> 1)
            g = cg + y
            y = y - (co >> 1)
            r = y + co
            v0, v1, v2 = r, g, y
    res = (v0, v1, v2)
    src = _RCT_PERM[perm]
    return [res[src[i]] for i in range(3)]


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    return native


@pytest.mark.parametrize("op", range(7))
@pytest.mark.parametrize("perm", range(6))
def test_rct_native_matches_oracle(lib, op, perm):
    rng = np.random.default_rng(op * 6 + perm)
    ins = [rng.integers(-(2**20), 2**20, (13, 17)).astype(np.int32) for _ in range(3)]
    want = _rct_oracle(ins, op, perm)
    outs = [x.copy() for x in ins]
    assert native.rct_native(tuple(outs), tuple(outs), op, perm)  # in-place alias
    for got, exp in zip(outs, want):
        np.testing.assert_array_equal(got, exp)


def test_rct_native_wraps_like_numpy_int32(lib):
    # overflow must wrap mod 2^32 exactly like numpy int32 arithmetic
    big = np.full((2, 2), 2**31 - 1, dtype=np.int32)
    ins = [big, big.copy(), big.copy()]
    want = _rct_oracle(ins, 6, 0)
    outs = [x.copy() for x in ins]
    native.rct_native(tuple(outs), tuple(outs), 6, 0)
    for got, exp in zip(outs, want):
        np.testing.assert_array_equal(got, exp)


def test_rct_native_strided_views(lib):
    rng = np.random.default_rng(7)
    base = [rng.integers(-1000, 1000, (20, 30)).astype(np.int32) for _ in range(6)]
    ins = [b[3:15, 5:25] for b in base[:3]]  # non-contiguous row views
    outs = [b[2:14, 1:21] for b in base[3:]]
    want = _rct_oracle(ins, 4, 2)
    assert native.rct_native(tuple(ins), tuple(outs), 4, 2)
    for got, exp in zip(outs, want):
        np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.uint16])
@pytest.mark.parametrize("n", [1, 3, 4])
def test_interleave_native(lib, dtype, n):
    rng = np.random.default_rng(3)
    planes = [rng.integers(0, 250, (31, 33)).astype(dtype) for _ in range(n)]
    got = native.interleave_native(planes)
    np.testing.assert_array_equal(got, np.stack(planes, axis=-1))


def test_interleave_native_rejects_mismatch(lib):
    a = np.zeros((4, 4), np.float32)
    b = np.zeros((4, 5), np.float32)
    assert native.interleave_native([a, b]) is None
    assert native.interleave_native([a.astype(np.float64)]) is None


def test_i32_to_f32_scaled(lib):
    rng = np.random.default_rng(5)
    p = rng.integers(0, 65535, (40, 51)).astype(np.int32)
    scale = np.float32(1.0 / 65535)
    got = native.i32_to_f32_scaled_native(p, float(scale))
    np.testing.assert_array_equal(got, p.astype(np.float32) * scale)
    # strided view
    v = p[5:30, 7:44]
    got = native.i32_to_f32_scaled_native(v, float(scale))
    np.testing.assert_array_equal(got, v.astype(np.float32) * scale)


def test_i32_scaled_interleave(lib):
    rng = np.random.default_rng(9)
    planes = [rng.integers(0, 4095, (23, 29)).astype(np.int32) for _ in range(3)]
    scale = np.float32(1.0 / 4095)
    got = native.i32_scaled_interleave_native(planes, float(scale))
    want = np.stack([p.astype(np.float32) * scale for p in planes], axis=-1)
    np.testing.assert_array_equal(got, want)
