"""Simple whole-image render: frame channels -> displayable RGB(A) floats.

This is the oracle render path (analog of the reference's
SimpleRenderPipeline): whole-image numpy stages assembled per frame
exactly as build_render_pipeline does (ref frame/render.rs:506-885).
The group-sharded JAX pipeline (render/pipeline.py) must match it
bit-for-bit on the interior and is validated against it.
"""

from __future__ import annotations

import numpy as np

from ..color import tf as tfmod
from ..color.xyb import xyb_to_linear, ycbcr_to_rgb
from ..io.headers import ColorSpace, TransferFunction
from ..io.headers.frame import Encoding


def _from_linear(channels, color_encoding, intensity_target):
    t = color_encoding.tf
    if t.have_gamma:
        return [tfmod.linear_to_gamma(c, t.gamma_value()) for c in channels]
    tfv = t.transfer_function
    if tfv == TransferFunction.SRGB:
        return [tfmod.linear_to_srgb(c) for c in channels]
    if tfv == TransferFunction.BT709:
        return [tfmod.linear_to_bt709(c) for c in channels]
    if tfv == TransferFunction.LINEAR:
        return list(channels)
    if tfv == TransferFunction.PQ:
        return [tfmod.linear_to_pq(c, intensity_target) for c in channels]
    if tfv == TransferFunction.DCI:
        return [tfmod.linear_to_gamma(c, 1.0 / 2.6) for c in channels]
    if tfv == TransferFunction.HLG:
        lum = (0.2126, 0.7152, 0.0722)
        r, g, b = tfmod.hlg_display_to_scene(intensity_target, lum, channels)
        return [tfmod.scene_to_hlg(c) for c in (r, g, b)]
    raise AssertionError(tfv)


def _modular_to_f32(plane: np.ndarray, bit_depth) -> np.ndarray:
    """ConvertModularToF32 (ref stages/convert.rs:345-): integer samples are
    scaled by 1/(2^bits-1); float samples are bit-reinterpreted."""
    if bit_depth.floating_point_sample:
        bits = bit_depth.bits_per_sample
        exp = bit_depth.exponent_bits_per_sample
        if bits == 32 and exp == 8:
            return plane.view(np.float32).copy()
        if bits == 16 and exp == 5:
            return (plane & 0xFFFF).astype(np.uint16).view(np.float16).astype(np.float32)
        # custom float format: assemble sign/exponent/mantissa into binary32
        mant_bits = bits - exp - 1
        u = plane.astype(np.uint32)
        sign = (u >> (bits - 1)) & 1
        e = (u >> mant_bits) & ((1 << exp) - 1)
        m = u & ((1 << mant_bits) - 1)
        bias = (1 << (exp - 1)) - 1
        out_e = np.where(e == 0, 0, e - bias + 127).astype(np.uint32)
        out = (sign << 31) | (out_e << 23) | (m << (23 - mant_bits))
        # subnormals of the custom format are scaled normals in f32 (approx)
        return out.astype(np.uint32).view(np.float32)
    bits = bit_depth.bits_per_sample
    scale = np.float32(1.0 / ((1 << bits) - 1))
    return plane.astype(np.float32) * scale


def render_frame(frame) -> np.ndarray:
    """Returns (h, w, c) float32 in display encoding (no orientation).

    Stage order follows ref frame/render.rs:506-885 (build_render_pipeline):
    convert -> chroma upsample -> gaborish -> EPF0/1/2 -> patches/splines ->
    color upsample -> noise -> YCbCr|XYB -> FromLinear -> save.
    """
    header = frame.header
    meta = frame.file_header.image_metadata
    w, h = header.size()
    num_ec = len(meta.extra_channel_info)

    if header.encoding == Encoding.VARDCT:
        planes = [p.copy() for p in frame.vardct_pixels]
    elif meta.xyb_encoded:
        # modular XYB order is [Y, X, B]; B has Y added
        # (ref convert.rs ConvertModularXYBToF32: :278-345)
        mg = frame.lf_global.modular_global
        sx_f, sy_f, sb_f = frame.lf_global.lf_quant.quant_factors
        iy = mg.output_channel(0).astype(np.float32)
        ix = mg.output_channel(1).astype(np.float32)
        ib = mg.output_channel(2).astype(np.float32)
        planes = [ix * np.float32(sx_f), iy * np.float32(sy_f), (ib + iy) * np.float32(sb_f)]
    else:
        mg = frame.lf_global.modular_global
        planes = [
            _modular_to_f32(mg.output_channel(c), meta.bit_depth)
            for c in range(frame.color_channels)
        ]
        if frame.color_channels == 1:
            planes = [planes[0]] * 3

    # chroma upsampling (420/422/440 VarDCT)
    from .stages import core as st

    for c in range(min(3, len(planes))):
        if header.hshift(c):
            for _ in range(header.hshift(c)):
                planes[c] = st.chroma_upsample_h(np, planes[c])
        if header.vshift(c):
            for _ in range(header.vshift(c)):
                planes[c] = st.chroma_upsample_v(np, planes[c])

    rf = header.restoration_filter
    if rf.gab and len(planes) >= 3:
        gw = [
            (rf.gab_x_weight1, rf.gab_x_weight2),
            (rf.gab_y_weight1, rf.gab_y_weight2),
            (rf.gab_b_weight1, rf.gab_b_weight2),
        ]
        for c in range(3):
            planes[c] = st.gaborish(np, planes[c], *gw[c])

    if rf.epf_iters > 0 and len(planes) >= 3:
        if header.encoding == Encoding.VARDCT:
            sigma_block = st.compute_sigma_image(frame)
            const_sigma = None
        else:
            sigma_block = None
            const_sigma = st.INV_SIGMA_NUM / rf.epf_sigma_for_modular
        rgb3 = planes[:3]
        if rf.epf_iters >= 3:
            rgb3 = st.epf_step(np, rgb3, sigma_block, rf, 0, constant_sigma=const_sigma)
        if rf.epf_iters >= 1:
            rgb3 = st.epf_step(np, rgb3, sigma_block, rf, 1, constant_sigma=const_sigma)
        if rf.epf_iters >= 2:
            rgb3 = st.epf_step(np, rgb3, sigma_block, rf, 2, constant_sigma=const_sigma)
        planes[:3] = rgb3

    if header.has_splines and frame.lf_global.splines is not None:
        wc, hc = header.size()
        planes = [np.ascontiguousarray(p[:hc, :wc]) for p in planes]
        frame.lf_global.splines.draw(planes[:3])

    # color upsampling
    if header.upsampling > 1:
        n = header.upsampling
        kern = st.build_upsample_kernels(
            getattr(frame.file_header.transform_data, f"weights{n}"), n
        )
        planes = [st.upsample(np, p, kern, n) for p in planes]

    if header.has_noise:
        from ..features.noise import add_noise, convolve_noise, generate_noise_field

        wu0, hu0 = header.size_upsampled()
        planes = [p[:hu0, :wu0] for p in planes]
        nf = generate_noise_field(frame)
        nf = [convolve_noise(np, p) for p in nf]
        planes[:3] = add_noise(
            np, planes[:3], nf, frame.lf_global.noise,
            frame.lf_global.color_correlation_params,
        )

    if meta.xyb_encoded:
        x, y, b = planes[:3]
        r, g, b = xyb_to_linear(
            x, y, b, frame.file_header.transform_data.opsin_inverse_matrix,
            meta.tone_mapping.intensity_target,
        )
        planes = _from_linear([r, g, b], meta.color_encoding, meta.tone_mapping.intensity_target)
    elif header.do_ycbcr:
        r, g, b = ycbcr_to_rgb(planes[1], planes[0], planes[2])
        planes = [r, g, b]

    wu, hu = header.size_upsampled()
    out = [p[:hu, :wu] for p in planes]

    # extra channels (alpha etc.), upsampled by their own factor
    mg = frame.lf_global.modular_global if frame.lf_global else None
    for i in range(num_ec):
        info = meta.extra_channel_info[i]
        ec = _modular_to_f32(mg.output_channel(3 + i), info.bit_depth)
        ec_up = header.ec_upsampling[i]
        if ec_up > 1:
            kern = st.build_upsample_kernels(
                getattr(frame.file_header.transform_data, f"weights{ec_up}"), ec_up
            )
            ec = st.upsample(np, ec, kern, ec_up)
        out.append(ec[:hu, :wu])

    return np.stack(out, axis=-1)
