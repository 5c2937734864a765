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


def test_xyb_output_profile_lcms_roundtrip():
    """XYB A2B0 profile (ref api/color.rs:768,2045): lcms2 must accept it
    and map scaled-XYB samples to sRGB matching our own opsin math (the
    ICC PCS-XYZ convention encodes 1.0 as 0x8000, hence the 2x factor in
    the expected pipeline)."""
    import numpy as np

    from jxl_tpu.color.cms import JxlCms, srgb_profile
    from jxl_tpu.color.icc_synth import primaries_to_xyz_d50, synthesize_icc
    from jxl_tpu.color.tf import srgb_to_linear
    from jxl_tpu.io.headers.image import ColorEncoding, ColorSpace

    enc = ColorEncoding()
    enc.color_space = ColorSpace.XYB
    enc.rendering_intent = 0
    prof = synthesize_icc(enc)
    assert prof[12:16] == b"scnr"
    t = JxlCms.begin_transforms(prof, srgb_profile(), 1)[0]

    SS = (22.995788804, 1.183000077, 1.502141333)
    SO = (0.015386134, 0.0, 0.27770459)
    OPSIN_BIAS = 0.0037930732552754493
    M = np.array(
        [1.5170095, -1.1065225, 0.071623, -0.050022, 0.5683655, -0.018344,
         -1.387676, 1.1145555, 0.6857255]
    ).reshape(3, 3)
    rng = np.random.default_rng(1)
    u = np.stack(
        [np.full(32, 0.5), rng.uniform(0.3, 0.7, 32), rng.uniform(0.4, 0.7, 32)],
        axis=-1,
    )
    lcms_lin = srgb_to_linear(t.run(u.astype(np.float32)).astype(np.float64))

    x = u[:, 0] / SS[0] - SO[0]
    y = u[:, 1] / SS[1] - SO[1]
    b = u[:, 2] / SS[2] - SO[2]
    cbrt_bias = -(OPSIN_BIAS ** (1 / 3))
    lms = np.stack(
        [(y + x - cbrt_bias) ** 3 - OPSIN_BIAS,
         (y - x - cbrt_bias) ** 3 - OPSIN_BIAS,
         (b + y - cbrt_bias) ** 3 - OPSIN_BIAS],
        axis=-1,
    )
    xyz_d50 = 2.0 * (lms @ M.T)  # PCS XYZ number encoding: 1.0 == 0x8000
    prims = ((0.64, 0.33), (0.30, 0.60), (0.15, 0.06))
    rgb_lin = xyz_d50 @ np.linalg.inv(primaries_to_xyz_d50(prims, 0.3127, 0.3290)).T
    m = (rgb_lin > 0.01) & (lcms_lin > 0.01)
    assert m.sum() > 40
    rel = np.abs(lcms_lin[m] / rgb_lin[m] - 1)
    assert float(rel.max()) < 0.01, float(rel.max())
