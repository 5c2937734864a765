"""Native (C++) decoder must be bit-exact with the Python oracle."""

import pathlib

import numpy as np
import pytest

from jxl_tpu import native
from jxl_tpu.api.simple import decode_first_frame

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")

FILES = [
    "3x3_srgb_lossless.jxl",
    "gray_alpha_lossless.jxl",
    "squeeze_edge.jxl",
    "extra_channels.jxl",
    "strategic_solid_blue.jxl",
]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("name", FILES)
def test_native_matches_oracle(name):
    data = (CORPUS / name).read_bytes()
    df_native = decode_first_frame(data)
    native._disabled = True
    try:
        df_oracle = decode_first_frame(data)
    finally:
        native._disabled = False
    for a, b in zip(df_native.channels, df_oracle.channels):
        assert np.array_equal(a, b)
