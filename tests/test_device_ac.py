"""Device VarDCT AC decode vs the native host path: bit-exact coefficient
equality over real corpus files (ref frame/group.rs:384-618; the host C++
decoder is the verified oracle)."""

import os

import numpy as np
import pytest

from jxl_tpu.api.simple import decode_image
from jxl_tpu.errors import JxlError
from jxl_tpu.io.bit_reader import BitReader
from jxl_tpu.io.container import extract_codestream
from jxl_tpu.io.headers import FileHeader
from jxl_tpu.io.headers.frame import Encoding, FrameHeader, Toc

FILES = [
    "green_queen_vardct_e3.jxl",
    "zoltan_tasi_unsplash.jxl",
    "progressive_ac.jxl",
    "tirr_photo.jxl",
]


def _decode_frame_coeffs(data, force_device: bool):
    """Decode the first VarDCT frame's coefficients; returns the flat
    (G*3*GD*GD,) int32 buffer, via device lanes or the host path."""
    from jxl_tpu.api.state import DecoderState
    from jxl_tpu.api.frame import Frame
    from jxl_tpu.vardct.device_group import (
        decode_ac_sections_device,
        check_device_ac_ok,
        eligible_for_device_ac,
    )

    codestream = extract_codestream(data)
    br = BitReader(codestream)
    fh = FileHeader.read(br)
    if fh.image_metadata.color_encoding.want_icc:
        from jxl_tpu.icc.decode import read_icc

        read_icc(br)
    state = DecoderState(fh)
    header = FrameHeader.read(br, fh)
    toc = Toc.read(br, header.num_toc_entries)
    br.jump_to_byte_boundary()
    frame = Frame(header, toc, fh, state)
    if header.encoding != Encoding.VARDCT or header.num_toc_entries == 1:
        pytest.skip("not a sectioned VarDCT frame")

    sections = frame.split_sections(br)
    frame.decode_lf_global(sections[frame.section_index("lf_global")])
    for g in range(header.num_lf_groups):
        frame.decode_lf_group(g, sections[frame.section_index("lf", group=g)])
    frame.decode_hf_global(sections[frame.section_index("hf_global")])
    frame.finalize_lf()
    frame._device_vardct = True  # allow the device path regardless of size
    frame.render_after_decode = False

    G = header.num_groups
    stride = 3 * 256 * 256
    if force_device:
        if not eligible_for_device_ac(frame):
            pytest.skip("frame not eligible for device AC")
        readers = {
            (g, p): sections[frame.section_index("hf", group=g, pass_idx=p)]
            for g in range(G)
            for p in range(header.passes.num_passes)
        }
        assert decode_ac_sections_device(frame, readers)
        check_device_ac_ok(frame)
        return np.asarray(frame._device_ac_flat)
    for g in range(G):
        readers = [
            (p, sections[frame.section_index("hf", group=g, pass_idx=p)])
            for p in range(header.passes.num_passes)
        ]
        frame.decode_hf_group(g, readers, render=False)
    flat = np.zeros(G * stride, dtype=np.int32)
    for g, c in frame.hf_global.hf_coefficients.items():
        flat[g * stride : (g + 1) * stride] = c.reshape(-1)
    return flat


@pytest.mark.parametrize("name", FILES)
def test_device_ac_bit_exact(corpus_dir, name):
    path = corpus_dir / name
    if not path.exists():
        pytest.skip(f"{name} not in corpus")
    data = path.read_bytes()
    host = _decode_frame_coeffs(data, force_device=False)
    dev = _decode_frame_coeffs(data, force_device=True)
    assert host.shape == dev.shape
    neq = np.nonzero(host != dev)[0]
    assert len(neq) == 0, f"{len(neq)} mismatched coeffs, first at {neq[:5]}"


def _all_corpus_files(corpus_dir):
    files = sorted(corpus_dir.glob("*.jxl")) + sorted(
        (corpus_dir / "conformance_test_images").glob("*.jxl")
    )
    return [f for f in files if f.name != "invalid_animated_ooo_jxlp.jxl"]


@pytest.mark.slow
def test_device_ac_bit_exact_corpus(corpus_dir):
    """Every eligible VarDCT file in the corpus decodes bit-exactly on
    device (the fast tier covers 4 representative files)."""
    checked = 0
    for path in _all_corpus_files(corpus_dir):
        data = path.read_bytes()
        try:
            host = _decode_frame_coeffs(data, force_device=False)
            dev = _decode_frame_coeffs(data, force_device=True)
        except (pytest.skip.Exception, JxlError, NotImplementedError):
            continue
        assert np.array_equal(host, dev), path.name
        checked += 1
    assert checked >= 5, f"only {checked} corpus files exercised the device path"


def test_device_ac_end_to_end(corpus_dir):
    """Full decode through the device-AC path matches the host path."""
    data = (corpus_dir / "green_queen_vardct_e3.jxl").read_bytes()
    old = os.environ.get("JXL_TPU_AC")
    try:
        os.environ["JXL_TPU_AC"] = "host"
        ref = decode_image(data, pixel_format="f32").frames[0]
        os.environ["JXL_TPU_AC"] = "device"
        out = decode_image(data, pixel_format="f32").frames[0]
    finally:
        if old is None:
            os.environ.pop("JXL_TPU_AC", None)
        else:
            os.environ["JXL_TPU_AC"] = old
    assert ref.shape == out.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)


def test_device_ac_rejects_corrupt(corpus_dir):
    """A corrupted AC section must raise a typed error, not crash."""
    data = bytearray((corpus_dir / "green_queen_vardct_e3.jxl").read_bytes())
    data[-40] ^= 0xFF  # flip bits inside the last HF section
    old = os.environ.get("JXL_TPU_AC")
    try:
        os.environ["JXL_TPU_AC"] = "device"
        with pytest.raises(JxlError):
            decode_image(bytes(data), pixel_format="f32")
    except pytest.fail.Exception:
        raise
    finally:
        if old is None:
            os.environ.pop("JXL_TPU_AC", None)
        else:
            os.environ["JXL_TPU_AC"] = old
