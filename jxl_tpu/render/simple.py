"""Simple whole-image render: frame channels -> displayable RGB(A) floats.

This is the oracle render path (analog of the reference's
SimpleRenderPipeline): whole-image numpy stages assembled per frame
exactly as build_render_pipeline does (ref frame/render.rs:506-885).
The group-sharded JAX pipeline must match it on the interior and is
validated against it.

Stage order: convert -> chroma upsample -> gaborish -> EPF0/1/2 ->
early EC upsample -> patches -> splines -> color upsample -> noise ->
[save LF / save-before-CT refs] -> YCbCr|XYB -> FromLinear ->
blending + extend -> [save-after-CT refs] -> spot colors.
"""

from __future__ import annotations

import numpy as np

from ..color import tf as tfmod
from ..color.xyb import xyb_to_linear, ycbcr_to_rgb
from ..io.headers import ColorSpace, ExtraChannel, TransferFunction
from ..io.headers.frame import BlendingMode, Encoding, FrameType
from .stages import core as st


def _from_linear(channels, tf_spec, intensity_target, xp=np, luminances=None):
    """FromLinear stage on linear channels. `tf_spec` is ("gamma", g) or
    ("enum", TransferFunction); `luminances` are the per-primary luminances
    of the output space (HLG OOTF, ref xyb.rs OutputColorInfo)."""
    kind, val = tf_spec
    if kind == "gamma":
        return [tfmod.linear_to_gamma(c, val, xp) for c in channels]
    tfv = val
    if tfv == TransferFunction.SRGB:
        return [tfmod.linear_to_srgb(c, xp) for c in channels]
    if tfv == TransferFunction.BT709:
        return [tfmod.linear_to_bt709(c, xp) for c in channels]
    if tfv == TransferFunction.LINEAR:
        return list(channels)
    if tfv == TransferFunction.PQ:
        return [tfmod.linear_to_pq(c, intensity_target, xp) for c in channels]
    if tfv == TransferFunction.DCI:
        return [tfmod.linear_to_gamma(c, 1.0 / 2.6, xp) for c in channels]
    if tfv == TransferFunction.HLG:
        lum = luminances or (0.2126, 0.7152, 0.0722)
        r, g, b = tfmod.hlg_display_to_scene(intensity_target, lum, channels, xp)
        return [tfmod.scene_to_hlg(c, xp) for c in (r, g, b)]
    raise AssertionError(tfv)


def _tf_spec(color_encoding) -> tuple:
    t = color_encoding.tf
    if t.have_gamma:
        return ("gamma", float(t.gamma_value()))
    return ("enum", t.transfer_function)


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
        mant_bits = bits - exp - 1
        u = plane.astype(np.uint32)
        sign = (u >> (bits - 1)) & 1
        e = (u >> mant_bits) & ((1 << exp) - 1)
        m = u & ((1 << mant_bits) - 1)
        bias = (1 << (exp - 1)) - 1
        out_e = np.where(e == 0, 0, e - bias + 127).astype(np.uint32)
        out = (sign << 31) | (out_e << 23) | (m << (23 - mant_bits))
        return out.astype(np.uint32).view(np.float32)
    bits = bit_depth.bits_per_sample
    scale = np.float32(1.0 / ((1 << bits) - 1))
    if plane.dtype == np.int32 and plane.ndim == 2:
        from .. import native

        out = native.i32_to_f32_scaled_native(plane, float(scale))
        if out is not None:
            return out
    return plane.astype(np.float32) * scale


def render_frame_channels(frame) -> list[np.ndarray]:
    """All stages up to (excluding) the color transform: returns 3+num_ec
    planes at size_upsampled (in XYB / YCbCr / raw color space)."""
    planes, _, _ = render_frame_channels_ex(frame, fuse=False)
    return planes


def render_frame_channels_ex(
    frame, fuse: bool, out_format: str = "f32"
) -> tuple[list[np.ndarray], bool, bool]:
    """Like render_frame_channels, but when `fuse` is set and no host-side
    stage (patches/splines/noise/upsampling/pre-CT saves) intervenes, the
    filter chain AND the color transform (and, when nothing downstream needs
    floats, the output pixel-format conversion) run as one fused device
    program (single upload + download).
    Returns (planes, color_transform_done, output_converted)."""
    header = frame.header
    meta = frame.file_header.image_metadata
    num_ec = len(meta.extra_channel_info)

    if header.encoding == Encoding.VARDCT:
        dev = getattr(frame, "vardct_pixels_dev", None)
        if dev is not None:
            # whole-frame device render: planes are jax arrays and stay on
            # device through the filter program (no pixel upload)
            planes = [dev[0], dev[1], dev[2]]
        else:
            planes = [p.copy() for p in frame.vardct_pixels]
    elif meta.xyb_encoded:
        # modular XYB order is [Y, X, B]; B has Y added (ref convert.rs:278)
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
            planes = [planes[0], planes[0].copy(), planes[0].copy()]

    mg = frame.lf_global.modular_global if frame.lf_global else None
    for i in range(num_ec):
        info = meta.extra_channel_info[i]
        planes.append(_modular_to_f32(mg.output_channel(3 + i), info.bit_depth))

    # -- staged pipeline (ref frame/render.rs:506-885 conditional
    # assembly; stage algebra in render/pipeline.py). Filters mirror at
    # the VISIBLE frame edge (crop stage before them — verified bit-exact
    # vs libjxl on 3x3_srgb_lossy). Device-rendered planes are already
    # chroma-upsampled in-program.
    from .pipeline import build_render_pipeline, run_stages

    dev_planes = getattr(frame, "vardct_pixels_dev", None) is not None
    stages, ctx = build_render_pipeline(frame, skip_chroma_upsample=dev_planes)
    if ctx.pop("needs_noise_field", False):
        from ..features.noise import generate_noise_field

        ctx["noise_field"] = generate_noise_field(frame)

    rf = header.restoration_filter
    color_done = False
    converted = False
    wu_f, hu_f = header.size_upsampled()
    all_device = all(s.device_ok for s in stages)
    can_fuse_color = (
        fuse
        and all_device
        and (rf.gab or rf.epf_iters > 0 or dev_planes)
        and header.frame_type != FrameType.REFERENCE_ONLY
        and not (header.can_be_referenced and header.save_before_ct)
        and header.lf_level == 0
    )
    # frames below ~0.16 MP aren't worth a device round trip: the host
    # numpy stage path beats dispatch+transfer latency (animation frames).
    # Modular frames pay BOTH an upload and a readback (VarDCT device
    # planes are already resident), so their crossover sits near 1 MP on
    # the tunneled chip (measured: 0.26 MP lossless is ~4x faster on host
    # numpy than through upload+filters+readback).
    host_cutoff = 160_000 if header.encoding == Encoding.VARDCT else 1 << 20
    small_frame = planes[0].size < host_cutoff and not dev_planes
    if not dev_planes and fuse:
        from ..utils.devhealth import device_fast

        if not device_fast():
            # tunnel-class (or wedged) device: the native host pipeline
            # wins at these sizes (see devhealth.device_fast)
            small_frame = True

    _FILTER_NAMES = {"gaborish", "epf0", "epf1", "epf2"}
    i_filt = next(
        (i for i, s in enumerate(stages) if s.name in _FILTER_NAMES), len(stages)
    )
    filters_only_rest = all(s.name in _FILTER_NAMES for s in stages[i_filt:])

    fmt = out_format
    if header.needs_blending() or header.can_be_referenced or num_ec > 0:
        fmt = "f32"

    if small_frame or not fuse:
        planes = run_stages(np, stages, planes, ctx)
        if (
            fmt == "u8"
            and not color_done
            and header.frame_type != FrameType.REFERENCE_ONLY
            and not (header.can_be_referenced and header.save_before_ct)
            and header.lf_level == 0
        ):
            fused = color_convert_u8_native(frame, planes)
            if fused is not None:
                planes = [fused[..., 0], fused[..., 1], fused[..., 2]]
                color_done = True
                converted = True
    elif can_fuse_color and filters_only_rest:
        # the common VarDCT path: chroma/crop on host (free slices), then
        # filters + color transform (+ output conversion) as the bucketed
        # shape-stable device program (single upload + download)
        from .device_filters import run_filters_and_color

        planes = run_stages(np, stages[:i_filt], planes, ctx)
        sigma_block = ctx.get("sigma_block")
        const_sigma = (
            None
            if sigma_block is not None or rf.epf_iters == 0
            else st.INV_SIGMA_NUM / rf.epf_sigma_for_modular
        )
        planes[:3] = run_filters_and_color(
            frame, planes[:3], sigma_block, const_sigma, (hu_f, wu_f), fmt
        )
        color_done = True
        converted = fmt != "f32"
    elif can_fuse_color:
        # feature frames (noise/upsampling/splines): the full device-ok
        # stage list plus the color transform runs as one jit program
        from .pipeline import color_transform_stage, convert_output_stage
        from .span_exec import run_span_device

        full = list(stages) + [color_transform_stage(frame)]
        if fmt != "f32":
            full.append(convert_output_stage(fmt, (0, 1, 2)))
        planes = run_span_device(full, planes, ctx, num_color=3)
        color_done = True
        converted = fmt != "f32"
    else:
        # mixed host/device: run maximal device spans as jit programs,
        # host stages in numpy (ref render pipeline's per-stage dispatch)
        from .pipeline import device_spans
        from .span_exec import run_span_device

        from ..utils.devhealth import device_ok

        for is_dev, span in device_spans(stages):
            if is_dev and planes[0].size >= 160_000 and device_ok():
                planes = run_span_device(span, planes, ctx)
            else:
                planes = run_stages(np, span, planes, ctx)

    out = []
    for p in planes:
        p = np.asarray(p)
        out.append(
            np.ascontiguousarray(p)
            if converted
            else np.ascontiguousarray(p, dtype=np.float32)
        )
    return out, color_done, converted


def color_convert_u8_native(frame, planes):
    """Fused native XYB -> sRGB -> dithered u8 (native/colors.cc, one
    pass, interleaved output) for eligible frames; None to fall back.
    Eligible: XYB-encoded, output TF sRGB per OutputColorInfo (covers
    plain sRGB, grayscale projection, and ICC-described XYB — the matrix
    carries the adaptation)."""
    meta = frame.file_header.image_metadata
    if not meta.xyb_encoded or frame.header.do_ycbcr:
        return None
    from ..color.output import output_color_info

    info = output_color_info(frame.file_header)
    nk = _native_tf_kind(info)
    if nk is None:
        return None
    from .. import native
    from .stages import core as st

    return native.xyb_srgb_u8_native(
        planes[:3],
        info.matrix,
        frame.file_header.transform_data.opsin_inverse_matrix.opsin_biases,
        info.intensity_target,
        st.dither_table(),
        nk[0],
        nk[1],
    )


def _native_tf_kind(info):
    """(tf_kind, tf_p0) for the native color kernels (colors.cc), or None
    when the TF needs the numpy path (HLG cross-channel OOTF)."""
    kind, val = info.tf
    if kind == "gamma":
        return 3, float(val)
    if val == TransferFunction.SRGB:
        return 0, 0.0
    if val == TransferFunction.PQ:
        return 1, float(info.intensity_target) / 10000.0
    if val == TransferFunction.BT709:
        return 2, 0.0
    if val == TransferFunction.DCI:
        return 3, 1.0 / 2.6
    if val == TransferFunction.LINEAR:
        return 4, 0.0
    return None


def color_transform(frame, planes, xp=np, in_place=False):
    """YCbCr|XYB -> linear -> display TF on the first 3 channels.

    XYB frames render into the image's nominal output space: the opsin
    inverse matrix is primaries/grayscale-adjusted and the TF chosen per
    OutputColorInfo (ref xyb.rs:41-146); ICC-described spaces render to
    sRGB (the CMS converts onward). With in_place=True the caller
    guarantees the planes are owned temporaries (reference-frame
    snapshots already taken), letting the native kernel skip a
    whole-plane copy per channel."""
    header = frame.header
    meta = frame.file_header.image_metadata
    if meta.xyb_encoded:
        from ..color.output import output_color_info

        info = output_color_info(frame.file_header)
        if xp is np:
            nk = _native_tf_kind(info)
            if nk is not None:
                from .. import native

                # the native kernel writes in place: hand it copies
                # unless the caller owns the planes (ascontiguousarray
                # is a no-op on contiguous f32 input, which would
                # mutate the caller's arrays)
                ps = []
                for p in planes[:3]:
                    q = np.ascontiguousarray(p, dtype=np.float32)
                    if q is p and not in_place:
                        q = p.copy()
                    ps.append(q)
                if native.xyb_tf_f32_native(
                    ps,
                    info.matrix,
                    frame.file_header.transform_data.opsin_inverse_matrix.opsin_biases,
                    info.intensity_target,
                    nk[0],
                    nk[1],
                ):
                    planes[:3] = ps
                    return planes
        r, g, b = xyb_to_linear(
            planes[0], planes[1], planes[2],
            frame.file_header.transform_data.opsin_inverse_matrix,
            info.intensity_target,
            xp,
            matrix=info.matrix,
        )
        planes[:3] = _from_linear(
            [r, g, b], info.tf, info.intensity_target, xp, info.luminances
        )
    elif header.do_ycbcr:
        r, g, b = ycbcr_to_rgb(planes[1], planes[0], planes[2], xp)
        planes[:3] = [r, g, b]
    return planes


def blend_and_extend(frame, planes):
    """Blending + ExtendToImageDimensions onto the full image canvas.

    ref stages/{blending,extend}.rs: bg = current frame pixels, fg = the
    reference canvas; Replace keeps the frame pixels.
    """
    from ..features.blending import perform_blending
    from ..features.patches import BlendMode, PatchBlending

    header = frame.header
    fh = frame.file_header
    img_w, img_h = fh.xsize, fh.ysize
    num_ch = len(planes)
    refs = frame.decoder_state.reference_frames if frame.decoder_state else [None] * 4

    _MODE_MAP = {
        BlendingMode.REPLACE: BlendMode.NONE,
        BlendingMode.ADD: BlendMode.ADD,
        BlendingMode.MUL: BlendMode.MUL,
        BlendingMode.BLEND: BlendMode.BLEND_BELOW,
        BlendingMode.ALPHA_WEIGHTED_ADD: BlendMode.ALPHA_WEIGHTED_ADD_BELOW,
    }

    def canvas_for(source):
        rf = refs[source]
        return rf["frame"] if rf is not None else None

    canvas = []
    for c in range(num_ch):
        src = (
            header.blending_info.source
            if c < 3
            else header.ec_blending_info[c - 3].source
        )
        ref = canvas_for(src)
        if ref is not None:
            canvas.append(np.array(ref[c], dtype=np.float32, copy=True))
        else:
            canvas.append(np.zeros((img_h, img_w), dtype=np.float32))

    # intersect frame rect with image
    x0, y0 = header.x0, header.y0
    fw, fh_ = planes[0].shape[1], planes[0].shape[0]
    ix0, iy0 = max(x0, 0), max(y0, 0)
    ix1, iy1 = min(x0 + fw, img_w), min(y0 + fh_, img_h)
    if ix1 <= ix0 or iy1 <= iy0:
        return canvas
    fx0, fy0 = ix0 - x0, iy0 - y0
    fx1, fy1 = fx0 + (ix1 - ix0), fy0 + (iy1 - iy0)

    bg = [p[fy0:fy1, fx0:fx1] for p in planes]
    fg = [c[iy0:iy1, ix0:ix1] for c in canvas]
    color_blending = PatchBlending(
        _MODE_MAP[header.blending_info.mode],
        header.blending_info.alpha_channel,
        header.blending_info.clamp,
    )
    ec_blending = [
        PatchBlending(_MODE_MAP[b.mode], b.alpha_channel, b.clamp)
        for b in header.ec_blending_info
    ]
    out = perform_blending(
        bg, fg, color_blending, ec_blending, fh.image_metadata.extra_channel_info
    )
    for c in range(num_ch):
        canvas[c][iy0:iy1, ix0:ix1] = out[c]
    return canvas


def apply_spot_and_premultiply(frame, canvas, options=None):
    """SpotColorStage + PremultiplyAlphaStage (ref stages/spot.rs:9-68,
    stages/premultiply_alpha.rs:11-; inserted per frame/render.rs:773-846).

    Spot channels mix their linear RGBA color into the color planes; with
    premultiply_output the color planes are multiplied by a straight
    (non-associated) alpha channel."""
    meta = frame.file_header.image_metadata
    render_spots = options is None or getattr(options, "render_spot_colors", True)
    if render_spots:
        for i, info in enumerate(meta.extra_channel_info):
            if info.ec_type == ExtraChannel.SPOT_COLOR and 3 + i < len(canvas):
                sc = [np.float32(v) for v in info.spot_color]
                mix = sc[3] * canvas[3 + i]
                for c in range(3):
                    canvas[c] = mix * sc[c] + (np.float32(1.0) - mix) * canvas[c]
    if options is not None and getattr(options, "premultiply_output", False):
        alpha = next(
            (
                3 + i
                for i, info in enumerate(meta.extra_channel_info)
                if info.ec_type == ExtraChannel.ALPHA and not info.alpha_associated
            ),
            None,
        )
        if alpha is not None and alpha < len(canvas):
            for c in range(3):
                canvas[c] = canvas[c] * canvas[alpha]
    return canvas


def render_frame(frame) -> np.ndarray:
    """Single-frame render to (h, w, c) display floats (no orientation,
    no blending with other frames). Kept for tests and simple files."""
    planes, color_done, _ = render_frame_channels_ex(frame, fuse=True)
    if not color_done:
        planes = color_transform(frame, planes)
    from .. import native

    arr = native.interleave_native(planes)
    return arr if arr is not None else np.stack(planes, axis=-1)


def apply_orientation(arr: np.ndarray, orientation) -> np.ndarray:
    from ..io.headers import Orientation

    o = Orientation(orientation)
    if o == Orientation.IDENTITY:
        return arr
    if o == Orientation.FLIP_HORIZONTAL:
        return arr[:, ::-1]
    if o == Orientation.ROTATE_180:
        return arr[::-1, ::-1]
    if o == Orientation.FLIP_VERTICAL:
        return arr[::-1, :]
    if o == Orientation.TRANSPOSE:
        return arr.transpose(1, 0, 2)
    if o == Orientation.ROTATE_90_CW:
        return arr.transpose(1, 0, 2)[:, ::-1]
    if o == Orientation.ANTI_TRANSPOSE:
        return arr.transpose(1, 0, 2)[::-1, ::-1]
    if o == Orientation.ROTATE_90_CCW:
        return arr.transpose(1, 0, 2)[::-1, :]
    raise AssertionError(o)
