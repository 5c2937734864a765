"""ICC profile synthesis (ref api/color.rs:768 maybe_create_profile):
synthesized profiles must be valid ICC (lcms2 accepts them), carry the
reference's description strings, and transform plausibly."""

import pathlib

import numpy as np
import pytest

from jxl_tpu.color.icc_synth import describe, synthesize_icc
from jxl_tpu.io.bit_reader import BitReader
from jxl_tpu.io.container import extract_codestream
from jxl_tpu.io.headers import FileHeader

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def enc_of(name):
    path = CORPUS / name
    if not path.exists():
        pytest.skip("corpus not available")
    fh = FileHeader.read(BitReader(extract_codestream(path.read_bytes())))
    return fh.image_metadata


@pytest.mark.parametrize(
    "name,desc",
    [
        ("hdr_pq_test.jxl", "Rec2100PQ"),
        ("hdr_hlg_test.jxl", "Rec2100HLG"),
        ("gray_alpha_lossless.jxl", "Gra_D65_Per_SRG"),
        ("3x3_srgb_lossless.jxl", "RGB_D65_SRG_Rel_g0.4545500"),
    ],
)
def test_description_strings(name, desc):
    meta = enc_of(name)
    assert describe(meta.color_encoding) == desc


@pytest.mark.parametrize(
    "name", ["hdr_pq_test.jxl", "hdr_hlg_test.jxl", "gray_alpha_lossless.jxl",
             "3x3_srgb_lossless.jxl", "pq_gradient.jxl"]
)
def test_profiles_accepted_by_lcms(name):
    meta = enc_of(name)
    icc = synthesize_icc(meta.color_encoding, meta.tone_mapping.intensity_target)
    assert icc[36:40] == b"acsp"
    assert int.from_bytes(icc[:4], "big") == len(icc)
    assert icc[84:100] != b"\0" * 16  # profile ID filled

    from jxl_tpu.color.cms import JxlCms, srgb_profile

    t = JxlCms.begin_transforms(icc, srgb_profile(), 1)[0]
    px = np.full((4, 4, t.in_channels), 0.5, dtype=np.float32)
    out = t.run(px)
    assert out.shape[-1] == 3
    assert np.isfinite(out).all()


def test_output_icc_api():
    from jxl_tpu.api.simple import decode_image

    path = CORPUS / "3x3_srgb_lossy.jxl"  # xyb-encoded, no embedded ICC
    if not path.exists():
        pytest.skip("corpus not available")
    img = decode_image(path.read_bytes())
    icc = img.output_icc()
    assert icc[36:40] == b"acsp"
    # embedded ICC passes through untouched
    path2 = CORPUS / "with_icc.jxl"
    img2 = decode_image(path2.read_bytes())
    assert img2.output_icc() == img2.icc_profile
