"""Overlapped banded decode (api/overlap.py): bit-identical to the
whole-image path, the reference's pipeline-equivalence discipline
(ref tests/macros.rs:38-47 assert_image_eq bit-identical gate)."""

import os

import numpy as np
import pytest

from jxl_tpu.api.simple import decode_image


def _decode(data, fmt, mode):
    os.environ["JXL_TPU_OVERLAP"] = mode
    try:
        return decode_image(data, pixel_format=fmt)
    finally:
        os.environ.pop("JXL_TPU_OVERLAP", None)


def _eligible(corpus_dir, name):
    from jxl_tpu.api import overlap
    from jxl_tpu.api.simple import parse_frame
    from jxl_tpu.io.bit_reader import BitReader
    from jxl_tpu.io.container import extract_codestream
    from jxl_tpu.io.headers import FileHeader

    data = (corpus_dir / name).read_bytes()
    br = BitReader(extract_codestream(data))
    fh = FileHeader.read(br)
    if fh.image_metadata.color_encoding.want_icc:
        from jxl_tpu.icc.decode import read_icc

        read_icc(br)
    if fh.image_metadata.preview is not None:
        pf = parse_frame(br, fh, None, preview=True)
        br.jump_to_byte_boundary()
        br.skip_bits(pf.toc.total_size * 8)
    frame = parse_frame(br, fh, None)
    return overlap.eligible(frame), data


def test_photo_is_eligible(corpus_dir):
    ok, _ = _eligible(corpus_dir, "zoltan_tasi_unsplash.jxl")
    assert ok


@pytest.mark.parametrize("fmt", ["u8", "f32"])
def test_overlap_bitexact_photo(corpus_dir, fmt):
    data = (corpus_dir / "zoltan_tasi_unsplash.jxl").read_bytes()
    ref = _decode(data, fmt, "0").frames[0]
    got = _decode(data, fmt, "1").frames[0]
    np.testing.assert_array_equal(ref, got)


def test_overlap_bitexact_multipass(corpus_dir):
    """Multi-pass progressive AC stream through the band pipeline."""
    ok, data = _eligible(corpus_dir, "progressive_ac.jxl")
    if not ok:
        pytest.skip("progressive_ac not overlap-eligible")
    ref = _decode(data, "u8", "0").frames[0]
    got = _decode(data, "u8", "1").frames[0]
    np.testing.assert_array_equal(ref, got)


_ELIGIBLE_CORPUS = [
    "green_queen_vardct_e3.jxl",
    "has_permutation.jxl",
    "has_permutation_with_container.jxl",
    "progressive_ac.jxl",
    "conformance_test_images/bench_oriented_brg.jxl",
    "conformance_test_images/opsin_inverse.jxl",
]


@pytest.mark.parametrize("name", _ELIGIBLE_CORPUS)
def test_overlap_bitexact_corpus(corpus_dir, name):
    """Every overlap-eligible corpus file decodes bit-identically
    through the band pipeline (incl. permuted TOCs and multi-pass)."""
    ok, data = _eligible(corpus_dir, name)
    if not ok:
        pytest.skip(f"{name} not overlap-eligible")
    ref = _decode(data, "u8", "0").frames[0]
    got = _decode(data, "u8", "1").frames[0]
    np.testing.assert_array_equal(ref, got)


def test_fallback_on_device_error(corpus_dir, monkeypatch):
    """Infrastructure failures mid-band fall back to the whole-frame
    path and still produce the correct image."""
    data = (corpus_dir / "zoltan_tasi_unsplash.jxl").read_bytes()
    ref = _decode(data, "u8", "0").frames[0]

    import jxl_tpu.vardct.device_band as db

    def boom(self, gy, free_coeffs=True):
        raise RuntimeError("simulated device failure")

    monkeypatch.setattr(db.BandRenderer, "dispatch", boom)
    got = _decode(data, "u8", "1").frames[0]
    np.testing.assert_array_equal(ref, got)
