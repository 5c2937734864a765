"""Multi-worker section decode must be bit-exact vs serial.

The reference validates its parallel fan-out by decoding every corpus
file with an 8-thread runner and requiring exact equality with the
sequential decode (jxl/src/tests/compare_parallel.rs:25-133). Here the
analogous fan-out is the HF-group thread pool
(jxl_tpu/api/frame.py:_decode_hf_groups_parallel): per-group entropy
runs in C++ with the GIL released and groups write disjoint rects, so
worker count must never change a single bit of output.
"""

import os

import numpy as np
import pytest

from conftest import corpus_file

FILES = [
    "green_queen_vardct_e3.jxl",  # VarDCT, 4 groups, EPF+gaborish
    "green_queen_modular_e3.jxl",  # lossless Modular, multi-group
    "zoltan_tasi_unsplash.jxl",  # 1 MP photo, 16 groups, multi-pass
]


def _decode_with_threads(data: bytes, n: int):
    from jxl_tpu.api.simple import decode_image

    old = os.environ.get("JXL_TPU_THREADS")
    os.environ["JXL_TPU_THREADS"] = str(n)
    try:
        img = decode_image(data, pixel_format="u8")
    finally:
        if old is None:
            os.environ.pop("JXL_TPU_THREADS", None)
        else:
            os.environ["JXL_TPU_THREADS"] = old
    return [np.asarray(f) for f in img.frames]


@pytest.mark.parametrize("fname", FILES)
@pytest.mark.parametrize("workers", [2, 4, 8])
def test_multiworker_bit_exact(corpus_dir, fname, workers):
    data = corpus_file(fname)
    serial = _decode_with_threads(data, 1)
    parallel = _decode_with_threads(data, workers)
    assert len(serial) == len(parallel)
    for s, p in zip(serial, parallel):
        np.testing.assert_array_equal(s, p)


@pytest.mark.slow
@pytest.mark.parametrize("fname", FILES)
def test_multiworker_stress(corpus_dir, fname):
    """Stress loop: repeated parallel decodes across worker counts must
    all match the serial decode exactly (scheduling-order independence;
    ref compare_parallel.rs's repeated-schedule exploration)."""
    data = corpus_file(fname)
    serial = _decode_with_threads(data, 1)
    for rep in range(5):
        for workers in (2, 3, 4, 8):
            parallel = _decode_with_threads(data, workers)
            for s, p in zip(serial, parallel):
                np.testing.assert_array_equal(s, p)
