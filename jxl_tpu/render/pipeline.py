"""Composable render-stage algebra.

Capability reference: jxl/src/render/mod.rs:53-115 (the
RenderPipelineInOutStage / InPlaceStage traits with per-stage BORDER and
SHIFT metadata), render/builder.rs:71-121 (RenderPipelineBuilder) and
frame/render.rs:506-885 (the per-frame conditional stage assembly).

TPU-first formulation: a Stage is a pure function `fn(xp, chans, ctx)`
over whole-image channel planes, generic over numpy (host oracle) and
jax.numpy (device program). The builder assembles the per-frame stage
list once per frame; the executor runs any contiguous `device_ok` span
as one fused jit program (single upload, single download), and the
BORDER/SHIFT metadata drives the halo calculator for the group-sharded
pipeline (the analog of low_memory_pipeline/mod.rs:184-289
border back-propagation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np


@dataclass
class Stage:
    """One render stage.

    border: input halo (bx, by) needed per output pixel (ref
        RenderPipelineInOutStage::BORDER, render/mod.rs:57).
    shift: log2 upsampling per axis (ref ::SHIFT): the stage consumes
        pixels at 1/2^shift the output resolution.
    channels: indices of the channels the stage reads/writes.
    device_ok: the stage body is jnp-traceable (pure, static shapes).
    key: hashable configuration for program caching.
    fn(xp, chans: list, ctx) -> list: the stage body; must treat `chans`
        as immutable (return a new list).
    """

    name: str
    fn: Callable
    border: tuple = (0, 0)
    shift: tuple = (0, 0)
    channels: tuple = (0, 1, 2)
    device_ok: bool = True
    key: tuple = ()
    # host fast-path tag: ("gab", weights6) or ("epf", step, rf, use_ctx,
    # sig_const); contiguous tagged stages fuse into one native C++ call
    native: tuple | None = None


def run_stages(xp, stages, chans, ctx=None):
    """Execute stages in order (whole-image; the oracle executor).

    Host path: contiguous gaborish/EPF stages collapse into one call to
    the native filter chain (native/filters.cc) — single-pass row loops
    instead of numpy's whole-plane temporaries."""
    i = 0
    n = len(stages)
    while i < n:
        s = stages[i]
        if xp is not np or s.native is None:
            chans = s.fn(xp, chans, ctx)
            i += 1
            continue
        j = i
        gabw = None
        rf = None
        sig_info = None
        steps = []
        while j < n and stages[j].native is not None:
            tag = stages[j].native
            if tag[0] == "gab":
                if gabw is not None or rf is not None:
                    break
                gabw = tag[1]
            else:
                steps.append(tag[1])
                rf = tag[2]
                sig_info = (tag[3], tag[4])
            j += 1
        # the chain entry expresses step sets via the iters convention
        # (>=3 -> step0, >=1 -> step1, >=2 -> step2); other subsets fall back
        iters = {(): 0, (1,): 1, (1, 2): 2, (0, 1, 2): 3}.get(tuple(steps))
        fused = (
            _run_filters_native(chans, ctx, gabw, rf, sig_info, iters)
            if iters is not None
            else None
        )
        if fused is None:
            chans = s.fn(xp, chans, ctx)
            i += 1
        else:
            chans = fused
            i = j
    return chans


def _run_filters_native(chans, ctx, gabw, rf, sig_info, epf_iters):
    """One native call for a gaborish+EPF stage run; None to fall back."""
    from ..native import filter_chain_native
    from .stages import core as st

    h, w = chans[0].shape
    inv_sigma = None
    sigma_is_block = False
    if rf is not None:
        use_ctx, sig_const = sig_info
        if use_ctx:
            inv_sigma = np.asarray(ctx["sigma_block"])
            sigma_is_block = True  # expanded in-kernel (saves two repeats)
        else:
            inv_sigma = np.full((-(-h // 8), -(-w // 8)), np.float32(sig_const))
            sigma_is_block = True
    # The pipeline planes are owned by this render (the host paths copy
    # frame state before the stage run), so the chain filters them in
    # place — the copy-in path costs ~0.5 s on a 23.7 MP frame. Falls
    # back to the copying call for non-qualifying layouts.
    out = filter_chain_native(
        chans[:3], inv_sigma, gabw, epf_iters, rf or _GAB_RF, sigma_is_block,
        in_place=True,
    )
    if out is None:
        out = filter_chain_native(
            chans[:3], inv_sigma, gabw, epf_iters, rf or _GAB_RF, sigma_is_block
        )
    if out is None:
        return None
    return out + list(chans[3:])


class _GabOnlyRf:
    epf_channel_scale = (40.0, 5.0, 3.5)
    epf_pass0_sigma_scale = 0.9
    epf_pass2_sigma_scale = 6.5
    epf_border_sad_mul = 2.0 / 3.0


_GAB_RF = _GabOnlyRf()


def pipeline_key(stages) -> tuple:
    return tuple((s.name, s.key) for s in stages)


def total_border(stages) -> tuple:
    """Back-propagate BORDER through SHIFT to the pipeline *input*
    resolution: the halo (in input pixels) a sharded executor must
    exchange to render a tile exactly (ref
    low_memory_pipeline/mod.rs:184-200 border_pixels_per_stage).

    Walking from the last stage backwards: a stage with shift s consumes
    input pixels at 1/2^s of its output resolution, so downstream border
    requirements divide by 2^s (rounded up) and its own border adds on.
    """
    bx = by = 0
    for s in reversed(stages):
        sx, sy = s.shift
        bx = -(-bx // (1 << sx)) + s.border[0]
        by = -(-by // (1 << sy)) + s.border[1]
    return (bx, by)


def device_spans(stages):
    """Split the stage list into maximal runs of device_ok stages:
    returns a list of (is_device, [stages])."""
    spans = []
    for s in stages:
        if spans and spans[-1][0] == bool(s.device_ok):
            spans[-1][1].append(s)
        else:
            spans.append((bool(s.device_ok), [s]))
    return spans


# -- stage constructors ------------------------------------------------------
#
# Each mirrors one reference stage (file:line cited); constants are
# captured at build time so the body is xp-generic and jit-traceable.


def _inplace(name, channels, key, body, device_ok=True):
    def fn(xp, chans, ctx):
        out = list(chans)
        for c in channels:
            out[c] = body(xp, out[c])
        return out

    return Stage(name, fn, channels=tuple(channels), device_ok=device_ok, key=key)


def chroma_upsample_stage(channel: int, horizontal: bool) -> Stage:
    """HorizontalChromaUpsample / Vertical (ref stages/chroma_upsample.rs:9,87)."""
    from .stages import core as st

    f = st.chroma_upsample_h if horizontal else st.chroma_upsample_v

    def fn(xp, chans, ctx):
        out = list(chans)
        out[channel] = f(xp, out[channel])
        return out

    return Stage(
        f"chroma_upsample_{'h' if horizontal else 'v'}[{channel}]",
        fn,
        border=(1, 0) if horizontal else (0, 1),
        shift=(1, 0) if horizontal else (0, 1),
        channels=(channel,),
        key=(channel, horizontal),
    )


def gaborish_stage(rf) -> Stage:
    """GaborishStage 3x3 (ref stages/gaborish.rs:11), BORDER (1,1)."""
    from .stages import core as st

    w = (
        (float(rf.gab_x_weight1), float(rf.gab_x_weight2)),
        (float(rf.gab_y_weight1), float(rf.gab_y_weight2)),
        (float(rf.gab_b_weight1), float(rf.gab_b_weight2)),
    )

    def fn(xp, chans, ctx):
        out = list(chans)
        for c in range(3):
            out[c] = st.gaborish(xp, out[c], w[c][0], w[c][1])
        return out

    gw = (w[0][0], w[0][1], w[1][0], w[1][1], w[2][0], w[2][1])
    return Stage("gaborish", fn, border=(1, 1), key=w, native=("gab", gw))


def epf_stage(rf, step: int, sigma_block, constant_sigma) -> Stage:
    """Epf0/1/2Stage (ref stages/epf/epf{0,1,2}.rs), BORDER 3/2/1."""
    from .stages import core as st

    rf_key = (
        tuple(rf.epf_channel_scale),
        float(rf.epf_pass0_sigma_scale),
        float(rf.epf_pass2_sigma_scale),
        float(rf.epf_border_sad_mul),
    )
    use_ctx_sigma = sigma_block is not None
    sig_const = None if use_ctx_sigma else float(constant_sigma)

    def fn(xp, chans, ctx):
        h, w = chans[0].shape
        if use_ctx_sigma:
            # per-frame data flows through ctx (not closure) so jitted
            # programs cache safely across frames with equal keys
            blk = ctx["sigma_block"]
            inv_sigma_px = st._expand_sigma(xp, xp.asarray(blk), h, w, (0, 0))
        else:
            inv_sigma_px = xp.full((h, w), np.float32(sig_const))
        out = list(chans)
        out[:3] = st.epf_step_px(xp, out[:3], inv_sigma_px, rf, step)
        return out

    border = {0: 3, 1: 2, 2: 1}[step]
    return Stage(
        f"epf{step}",
        fn,
        border=(border, border),
        key=(step, rf_key, sig_const),
        native=("epf", step, rf, use_ctx_sigma, sig_const),
    )


def upsample_stage(frame, n: int, channels) -> Stage:
    """Upsample2x/4x/8x (ref stages/upsample.rs:15-398): 5x5 per-phase
    kernels from CustomTransformData, BORDER (2,2), SHIFT (log2 n)."""
    from .stages import core as st

    kern = st.build_upsample_kernels(
        getattr(frame.file_header.transform_data, f"weights{n}"), n
    )
    s = {2: 1, 4: 2, 8: 3}[n]

    def fn(xp, chans, ctx):
        out = list(chans)
        for c in channels:
            out[c] = st.upsample(xp, out[c], kern, n)
        return out

    return Stage(
        f"upsample{n}x{list(channels)}",
        fn,
        border=(2, 2),
        shift=(s, s),
        channels=tuple(channels),
        key=(n, tuple(channels), hash(kern.tobytes())),
    )


def crop_stage(w: int, h: int, channels) -> Stage:
    """Restrict channels to the visible rect (spec edge-extension point)."""

    def fn(xp, chans, ctx):
        out = list(chans)
        for c in channels:
            if out[c].shape[0] > h or out[c].shape[1] > w:
                out[c] = out[c][:h, :w]
        return out

    return Stage("crop", fn, channels=tuple(channels), key=(w, h, tuple(channels)))


def noise_convolve_add_stage(frame) -> Stage:
    """ConvolveNoiseStage (BORDER 2) + AddNoiseStage (ref stages/noise.rs).

    The xorshift128+ field is generated host-side (bit-exact sequential
    RNG) and enters the program as data; the 5x5 convolve and the
    strength-LUT add run on device.
    """
    from ..features.noise import add_noise, convolve_noise

    noise = frame.lf_global.noise
    ccp = frame.lf_global.color_correlation_params

    def fn(xp, chans, ctx):
        nf = ctx["noise_field"]
        conv = [convolve_noise(xp, xp.asarray(p)) for p in nf]
        out = list(chans)
        out[:3] = add_noise(xp, out[:3], conv, noise, ccp)
        return out

    cfl_key = (
        (float(ccp.y_to_x_lf), float(ccp.y_to_b_lf)) if ccp is not None else None
    )
    return Stage(
        "noise",
        fn,
        border=(2, 2),
        key=(tuple(noise.lut), cfl_key),
    )


def splines_stage(frame) -> Stage:
    """SplinesStage (ref stages/splines.rs): the centripetal Catmull-Rom
    arc samples are rendered host-side at LfGlobal into per-row additive
    segments; on device the splat is one scatter-add of precomputed
    (row, x0, values) runs flattened to COO indices."""
    splines = frame.lf_global.splines

    def fn(xp, chans, ctx):
        out = list(chans)
        h, w = out[0].shape
        if xp is np:
            from ..native import spline_splat_native

            planes = [np.array(out[c], dtype=np.float32) for c in range(3)]
            if spline_splat_native(planes, splines):
                out[:3] = planes
                return out
        splat = ctx["spline_splat"]
        idx, vals = splat() if callable(splat) else splat
        for c in range(3):
            flat = out[c].reshape(-1)
            flat = flat.at[idx].add(vals[c]) if xp is not np else _np_scatter_add(
                flat.copy(), idx, vals[c]
            )
            out[c] = flat.reshape(h, w)
        return out

    return Stage("splines", fn, key=("splines",))


def _np_scatter_add(flat, idx, vals):
    np.add.at(flat, idx, vals)
    return flat


def ycbcr_stage() -> Stage:
    from ..color.xyb import ycbcr_to_rgb

    def fn(xp, chans, ctx):
        out = list(chans)
        r, g, b = ycbcr_to_rgb(out[1], out[0], out[2], xp)
        out[:3] = [r, g, b]
        return out

    return Stage("ycbcr_to_rgb", fn, key=())


def color_transform_stage(frame) -> Stage:
    """XybStage + FromLinearStage (or YCbCr) via render_simple.color_transform."""
    meta = frame.file_header.image_metadata
    ce = meta.color_encoding

    def fn(xp, chans, ctx):
        from . import simple as render_simple

        out = list(chans)
        return render_simple.color_transform(frame, out, xp=xp)

    t = ce.tf
    key = (
        bool(meta.xyb_encoded),
        bool(frame.header.do_ycbcr),
        bool(ce.want_icc),
        int(ce.color_space),
        int(ce.white_point),
        int(ce.primaries),
        ce.white.as_f32(),
        tuple(p.as_f32() for p in ce.custom_primaries),
        ("gamma", float(t.gamma_value())) if t.have_gamma else int(t.transfer_function),
        float(meta.tone_mapping.intensity_target),
        tuple(frame.file_header.transform_data.opsin_inverse_matrix.inverse_matrix),
        tuple(frame.file_header.transform_data.opsin_inverse_matrix.opsin_biases),
    )
    return Stage("color_transform", fn, key=key)


def convert_output_stage(fmt: str, channels) -> Stage:
    """ConvertF32To{U8,U16,F16} (ref stages/convert.rs:549-790)."""
    from .stages import core as st

    def fn(xp, chans, ctx):
        out = list(chans)
        for c in channels:
            out[c] = st.convert_output(xp, out[c], fmt, channel=c)
        return out

    return Stage(
        f"convert_{fmt}", fn, channels=tuple(channels), key=(fmt, tuple(channels))
    )


# -- patches (device scatter for eligible dictionaries) ----------------------


def _patch_plan(frame, num_ec: int, h: int, w: int, max_layers: int = 4):
    """Cheap (rect-only) eligibility + layer count for the dense device
    patches formulation: uniform blending descriptor, reference frames
    present, first-fit layer assignment within max_layers. Returns the
    layer count or None — without materializing any dense plane."""
    pd = frame.lf_global.patches
    refs = (
        frame.decoder_state.reference_frames if frame.decoder_state else [None] * 4
    )
    stride = pd.blendings_stride
    n = len(pd.positions)
    if n == 0:
        return None
    desc0 = tuple((b.mode, b.alpha_channel, b.clamp) for b in pd.blendings[:stride])
    for pi in range(1, n):
        if (
            tuple(
                (b.mode, b.alpha_channel, b.clamp)
                for b in pd.blendings[pi * stride : (pi + 1) * stride]
            )
            != desc0
        ):
            return None
    C = 3 + num_ec
    layer_rects: list = []
    for pos in pd.positions:
        rp = pd.ref_positions[pos.ref_pos_idx]
        ref = refs[rp.reference]
        if ref is None or ref.get("frame") is None:
            return None
        rfp = ref["frame"]
        if len(rfp) < C:
            return None
        ph = min(rp.ysize, h - pos.y, rfp[0].shape[0] - rp.y0)
        pw = min(rp.xsize, w - pos.x, rfp[0].shape[1] - rp.x0)
        if ph <= 0 or pw <= 0:
            continue
        rect = (pos.y, pos.y + ph, pos.x, pos.x + pw)
        li = 0
        while li < len(layer_rects) and any(
            r[0] < rect[1] and rect[0] < r[1] and r[2] < rect[3] and rect[2] < r[3]
            for r in layer_rects[li]
        ):
            li += 1
        if li >= max_layers:
            return None
        if li == len(layer_rects):
            layer_rects.append([])
        layer_rects[li].append(rect)
    if not layer_rects:
        return None
    return len(layer_rects)


def _dense_patch_layers(frame, num_ec: int, h: int, w: int, max_layers: int = 4):
    """Precompute dense per-layer fg planes + coverage masks for the
    device patches stage (ref stages/patches.rs re-expressed as masked
    whole-image blends).

    Sequential patch semantics are preserved by layering: each patch is
    first-fit assigned to the earliest layer whose coverage it doesn't
    intersect, so any patch overlapping an earlier one lands in a later
    layer and blends against the earlier result. Eligible only when all
    patches share one blending descriptor (every corpus dictionary does);
    returns None (host fallback) otherwise."""
    pd = frame.lf_global.patches
    refs = (
        frame.decoder_state.reference_frames if frame.decoder_state else [None] * 4
    )
    stride = pd.blendings_stride
    n = len(pd.positions)
    if n == 0:
        return None
    desc0 = tuple((b.mode, b.alpha_channel, b.clamp) for b in pd.blendings[:stride])
    for pi in range(1, n):
        if (
            tuple(
                (b.mode, b.alpha_channel, b.clamp)
                for b in pd.blendings[pi * stride : (pi + 1) * stride]
            )
            != desc0
        ):
            return None
    C = 3 + num_ec
    layers_fg: list = []
    layers_mask: list = []
    for pos in pd.positions:
        rp = pd.ref_positions[pos.ref_pos_idx]
        ref = refs[rp.reference]
        if ref is None or ref.get("frame") is None:
            return None
        rfp = ref["frame"]
        if len(rfp) < C:
            return None
        ph = min(rp.ysize, h - pos.y, rfp[0].shape[0] - rp.y0)
        pw = min(rp.xsize, w - pos.x, rfp[0].shape[1] - rp.x0)
        if ph <= 0 or pw <= 0:
            continue
        li = 0
        while li < len(layers_mask) and layers_mask[li][
            pos.y : pos.y + ph, pos.x : pos.x + pw
        ].any():
            li += 1
        if li >= max_layers:
            return None
        if li == len(layers_mask):
            layers_fg.append(np.zeros((C, h, w), np.float32))
            layers_mask.append(np.zeros((h, w), bool))
        for c in range(C):
            layers_fg[li][c, pos.y : pos.y + ph, pos.x : pos.x + pw] = rfp[c][
                rp.y0 : rp.y0 + ph, rp.x0 : rp.x0 + pw
            ]
        layers_mask[li][pos.y : pos.y + ph, pos.x : pos.x + pw] = True
    if not layers_mask:
        return None
    return np.stack(layers_fg), np.stack(layers_mask)


def patches_stage(frame, num_ec: int, ctx: dict | None = None) -> Stage:
    """PatchesStage (ref stages/patches.rs; dictionary features/patches.rs).

    Device path: uniform-descriptor dictionaries blend as L masked
    whole-image passes (fg planes + coverage masks precomputed host-side
    per layer, entering the program as data); every blend mode is
    pointwise so the math is the shared xp-generic perform_blending.
    Host fallback applies the full sequential dictionary."""
    pd = frame.lf_global.patches
    wc, hc = frame.header.size()
    num_layers = _patch_plan(frame, num_ec, hc, wc) if ctx is not None else None

    def host_apply(chans):
        out = [np.ascontiguousarray(p) for p in chans]
        refs = (
            frame.decoder_state.reference_frames
            if frame.decoder_state
            else [None] * 4
        )
        pd.apply(out, frame.file_header.image_metadata.extra_channel_info, refs)
        return out

    if num_layers is not None:
        # dense layers materialize LAZILY (thunks in ctx, resolved by
        # run_span_device at dispatch): host execution applies patches
        # straight to their rects instead — whole-canvas fg planes and
        # masked blends only pay off as fused device passes
        def _materialize():
            dense = _dense_patch_layers(frame, num_ec, hc, wc)
            return dense if dense is not None else (None, None)

        _cache: list = []

        def fg_thunk():
            if not _cache:
                _cache.append(_materialize())
            return _cache[0][0]

        def mask_thunk():
            if not _cache:
                _cache.append(_materialize())
            return _cache[0][1]

        ctx["patch_fg"] = fg_thunk
        ctx["patch_mask"] = mask_thunk
        stride = pd.blendings_stride
        color_blending = pd.blendings[0]
        ec_blending = list(pd.blendings[1:stride])
        eci = frame.file_header.image_metadata.extra_channel_info
        C = 3 + num_ec

        def fn(xp, chans, ctx_):
            if xp is np:
                return host_apply(chans)
            from ..features.blending import perform_blending

            fg_l = ctx_["patch_fg"]
            mask_l = ctx_["patch_mask"]
            out = list(chans)
            for li in range(num_layers):
                fg = [fg_l[li, c] for c in range(C)]
                blended = perform_blending(
                    out[:C], fg, color_blending, ec_blending, eci, xp=xp
                )
                m = mask_l[li]
                out[:C] = [
                    xp.where(m, b, o) for b, o in zip(blended, out[:C])
                ]
            return out

        desc = tuple((b.mode, b.alpha_channel, b.clamp) for b in pd.blendings[:stride])
        return Stage(
            "patches",
            fn,
            channels=tuple(range(C)),
            device_ok=True,
            key=("patches_dev", num_layers, desc),
        )

    def fn(xp, chans, ctx_):
        return host_apply(chans)

    return Stage(
        "patches",
        fn,
        channels=tuple(range(3 + num_ec)),
        device_ok=False,
        key=("patches", len(pd.positions)),
    )


def build_render_pipeline(frame, *, skip_chroma_upsample: bool = False):
    """Per-frame stage assembly (ref frame/render.rs:506-885 order):
    chroma upsample -> [visible crop] -> gaborish -> EPF -> early EC
    upsample -> patches -> splines -> color upsample -> noise. Color
    transform / output conversion / blending / save stages are appended
    by the executor per its fusion rules.

    Returns (stages, ctx) where ctx carries host-precomputed data
    (noise field, spline splat) consumed by device_ok stage bodies.
    """
    from .stages import core as st

    header = frame.header
    meta = frame.file_header.image_metadata
    num_ec = len(meta.extra_channel_info)
    rf = header.restoration_filter
    from ..io.headers.frame import Encoding

    is_vardct = header.encoding == Encoding.VARDCT

    stages = []
    ctx = {}

    if not skip_chroma_upsample:
        for c in range(3):
            for _ in range(header.hshift(c)):
                stages.append(chroma_upsample_stage(c, True))
            for _ in range(header.vshift(c)):
                stages.append(chroma_upsample_stage(c, False))

    wc, hc = header.size()
    stages.append(crop_stage(wc, hc, tuple(range(3))))

    if rf.gab:
        stages.append(gaborish_stage(rf))
    if rf.epf_iters > 0:
        if is_vardct:
            ctx["sigma_block"] = st.compute_sigma_image(frame)
            sigma_block, const_sigma = ctx["sigma_block"], None
        else:
            sigma_block = None
            const_sigma = st.INV_SIGMA_NUM / rf.epf_sigma_for_modular
        if rf.epf_iters >= 3:
            stages.append(epf_stage(rf, 0, sigma_block, const_sigma))
        if rf.epf_iters >= 1:
            stages.append(epf_stage(rf, 1, sigma_block, const_sigma))
        if rf.epf_iters >= 2:
            stages.append(epf_stage(rf, 2, sigma_block, const_sigma))

    late_ec_upsample = header.upsampling > 1 and all(
        u == header.upsampling for u in header.ec_upsampling
    )
    if not late_ec_upsample:
        for i, ec_up in enumerate(header.ec_upsampling):
            if ec_up > 1:
                stages.append(upsample_stage(frame, ec_up, (3 + i,)))

    if header.has_patches:
        stages.append(patches_stage(frame, num_ec, ctx))
    if header.has_splines and frame.lf_global.splines is not None:
        splines = frame.lf_global.splines
        # lazy: the host stage splats segments natively; only the device
        # scatter-add resolves the COO flatten (memoized)
        _splat_cache: list = []

        def _splat(sp=splines, hh=hc, ww=wc):
            if not _splat_cache:
                _splat_cache.append(_spline_splat(sp, hh, ww))
            return _splat_cache[0]

        ctx["spline_splat"] = _splat
        stages.append(splines_stage(frame))

    if header.upsampling > 1:
        n_up = 3 + num_ec if late_ec_upsample else 3
        stages.append(
            upsample_stage(frame, header.upsampling, tuple(range(n_up)))
        )

    wu, hu = header.size_upsampled()
    stages.append(crop_stage(wu, hu, tuple(range(3 + num_ec))))

    if header.has_noise:
        stages.append(noise_convolve_add_stage(frame))
        ctx["needs_noise_field"] = True

    return stages, ctx


def _spline_splat(splines, h, w):
    """Flatten the spline draw cache to COO (idx, [vals_x, vals_y, vals_b])
    for a single scatter-add (device or host)."""
    from ..features.splines import fast_erf

    idx_parts = []
    val_parts = [[], [], []]
    for seg in splines.segments:
        x0 = max(0, int(round(seg.center_x - seg.maximum_distance)))
        x1 = min(w, int(round(seg.center_x + seg.maximum_distance)) + 1)
        y0 = max(0, int(round(seg.center_y - seg.maximum_distance)))
        y1 = min(h, int(round(seg.center_y + seg.maximum_distance)) + 1)
        if x1 <= x0 or y1 <= y0:
            continue
        xs = np.arange(x0, x1, dtype=np.float32) - np.float32(seg.center_x)
        ys = np.arange(y0, y1, dtype=np.float32) - np.float32(seg.center_y)
        dist = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2)
        c = np.float32(0.35355338)
        arg1 = (dist * np.float32(0.5) + c) * np.float32(seg.inv_sigma)
        arg2 = (dist * np.float32(0.5) - c) * np.float32(seg.inv_sigma)
        f = fast_erf(arg1) - fast_erf(arg2)
        local = (np.float32(seg.sigma_over_4_times_intensity) * f * f).ravel()
        yy = np.arange(y0, y1, dtype=np.int32)
        xx = np.arange(x0, x1, dtype=np.int32)
        idx_parts.append((yy[:, None] * w + xx[None, :]).ravel())
        for ci in range(3):
            val_parts[ci].append(np.float32(seg.color[ci]) * local)
    if not idx_parts:
        z = np.zeros(0, np.int32)
        return z, [np.zeros(0, np.float32)] * 3
    return (
        np.concatenate(idx_parts),
        [np.concatenate(v).astype(np.float32) for v in val_parts],
    )
