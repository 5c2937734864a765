"""Bounded-memory (banded) decode: O(group-row) peak memory.

Capability reference: jxl/src/render/low_memory_pipeline/ — the
reference streams groups through per-stage row rings
(row_buffers.rs) with per-group halo buffers and 3x3 readiness
scheduling (group_scheduler.rs:100-180). The TPU-first analog processes
one GROUP ROW BAND at a time in raster order: entropy-decode the band's
sections, run the filter chain over [tail of band k-1 | band k | head of
band k+1] (one-band lookahead replaces the readiness mask), color
transform, convert, and emit rows to a sink — the whole image is never
resident. Filters mirror at the visible frame edges exactly like the
whole-image pipeline, so output rows are bit-identical to the one-shot
decoder.

Eligibility (everything else falls back to the whole-image decoder):
single REGULAR last frame, upsampling 1, no patches/splines, no
blending/reference saves, and for Modular encoding no global transforms
(squeeze couples distant rows). Noise IS admitted: the xorshift128+
field is seeded per group subregion, so a band plus the 2-row convolve
margin generates locally (features/noise.py generate_noise_field_rows).
Extra channels ARE admitted for Modular streams (dim_shift 0,
ec_upsampling 1): EC planes are band-local rows of the same per-group
HF sections and pass through filters untouched. This mirrors the
reference's own pipeline split: the general path exists, the low-memory
path engages where its preconditions hold.
"""

from __future__ import annotations

import numpy as np

from ..errors import NotSupported
from ..io.bit_reader import BitReader
from ..io.headers import FileHeader
from ..io.headers.frame import Encoding, FrameType
from ..render.stages import core as st

FILTER_HALO = 8  # gaborish 1 + EPF 3+2+1 rounded up to a whole block row


def eligible(frame) -> bool:
    h = frame.header
    if h.frame_type != FrameType.REGULAR or not h.is_last:
        return False
    if h.upsampling != 1 or any(u != 1 for u in h.ec_upsampling):
        return False
    # patches and splines are row-local at application time (ref
    # render/low_memory_pipeline stages): both are admitted — patches
    # blend clipped rects from the (already whole-decoded) reference
    # frames, splines splat their row window
    meta = frame.file_header.image_metadata
    if h.num_extra_channels != 0:
        # EC planes ride the per-group HF sections on both paths; banded
        # needs each EC buffer group-gridded at full resolution
        if any(info.dim_shift != 0 for info in meta.extra_channel_info):
            return False
        if h.encoding != Encoding.MODULAR:
            mg = frame.lf_global.modular_global if frame.lf_global else None
            if mg is None:
                return False
            # zero-predictor, delta-free palettes on an hf-gridded index
            # channel are a pure per-pixel lookup — row-local; anything
            # else (squeeze pyramids, predicted palettes) stays whole
            from ..modular.transforms import PaletteStep, Predictor

            for s in mg.transform_steps:
                if (
                    not isinstance(s, PaletteStep)
                    or s.num_deltas != 0
                    or s.predictor != Predictor.ZERO
                    or mg.grid_kind[s.buf_in] != "hf"
                    or mg.buffer_infos[s.buf_in].shift != (0, 0)
                ):
                    return False
            for p in range(h.passes.num_passes):
                for b in mg.section_buffer_indices[2 + p]:
                    if (
                        mg.grid_kind[b] != "hf"
                        or mg.buffer_infos[b].shift != (0, 0)
                    ):
                        return False
    if h.needs_blending() or h.can_be_referenced or h.lf_level != 0:
        return False
    if h.num_toc_entries == 1:
        return False  # single-section streams are small by definition
    if h.encoding == Encoding.MODULAR:
        if h.passes.num_passes != 1:
            return False  # per-pass channel assignment: whole-image path
        mg = frame.lf_global.modular_global if frame.lf_global else None
        if mg is None or mg.transform_steps:
            return False
        if mg.global_header is None:
            return False
        if frame.color_channels != 3:
            return False
    else:
        if not h.is444:
            return False
    return True


def _decode_reference_frame(frame, br, state) -> None:
    """Whole-decode one invisible leading frame and store it in `state`
    exactly as the one-shot decoder does (api/simple.py frame loop)."""
    from ..io.headers.frame import FrameType as FT
    from ..render.simple import (
        blend_and_extend,
        color_transform,
        render_frame_channels_ex,
    )

    header = frame.header
    frame.decode_all_sections(br)
    planes, color_done, _ = render_frame_channels_ex(frame, fuse=True)
    if header.lf_level != 0:
        state.lf_frames[header.lf_level - 1] = [p.copy() for p in planes[:3]]
    if header.can_be_referenced and header.save_before_ct:
        state.reference_frames[header.save_as_reference] = {
            "frame": [p.copy() for p in planes],
            "saved_before_color_transform": True,
        }
    if header.frame_type != FT.REFERENCE_ONLY and not color_done:
        planes = color_transform(frame, planes, in_place=True)
    if header.can_be_referenced and not header.save_before_ct:
        if header.needs_blending():
            canvas = blend_and_extend(frame, planes)
        else:
            img_w, img_h = frame.file_header.xsize, frame.file_header.ysize
            canvas = [p[:img_h, :img_w] for p in planes]
        state.reference_frames[header.save_as_reference] = {
            "frame": [np.array(p, copy=True) for p in canvas],
            "saved_before_color_transform": False,
        }


def decode_banded(data: bytes, emit, pixel_format: str = "f32") -> dict:
    """Decode `data`, calling emit(y0, band) for each finished row band
    (band: (rows, width, 3) array in `pixel_format`). Returns summary
    info. Raises NotSupported for ineligible streams."""
    from .decoder import _BoxParser
    from .simple import parse_frame

    boxes = _BoxParser()
    boxes.feed(data)
    boxes.finish()
    codestream = bytes(boxes.codestream)

    br = BitReader(codestream)
    fh = FileHeader.read(br)
    meta = fh.image_metadata
    if meta.color_encoding.want_icc:
        from ..icc.decode import read_icc

        read_icc(br)

    # leading INVISIBLE frames (patch sources, LF frames) decode whole —
    # the reference's low-memory pipeline also keeps reference frames
    # resident (render/low_memory_pipeline/mod.rs uses the frame store);
    # only the final visible REGULAR frame streams in bands
    from .state import DecoderState

    state = DecoderState(fh)
    while True:
        br.jump_to_byte_boundary()
        frame = parse_frame(br, fh, state)
        header = frame.header
        if header.frame_type == FrameType.REGULAR and header.is_last:
            break
        if header.is_visible or header.is_last:
            raise NotSupported("leading visible frames not banded")
        _decode_reference_frame(frame, br, state)
    br.jump_to_byte_boundary()
    toc_end = br.pos // 8

    # LfGlobal (modular storage NOT allocated: band buffers replace it)
    frame.begin_sections()
    import jxl_tpu.modular.image as mod_image

    orig_read = mod_image.FullModularImage.read
    if header.encoding == Encoding.MODULAR:
        def lazy_read(fhdr, imeta, mcc, br2, allocate=True):
            return orig_read(fhdr, imeta, mcc, br2, allocate=False)

        mod_image.FullModularImage.read = staticmethod(lazy_read)
    try:
        sec = frame._section_reader(frame.section_index("lf_global"), codestream, toc_end)
        frame.decode_lf_global(sec)
    finally:
        mod_image.FullModularImage.read = orig_read

    if not eligible(frame):
        raise NotSupported("stream not eligible for banded decode")

    for g in range(header.num_lf_groups):
        sec = frame._section_reader(
            frame.section_index("lf", group=g), codestream, toc_end
        )
        frame.decode_lf_group(g, sec)
    sec = frame._section_reader(frame.section_index("hf_global"), codestream, toc_end)
    frame.decode_hf_global(sec)
    frame.finalize_lf()

    wv, hv = header.size()
    gdim = header.group_dim
    gx_count, gy_count = header.size_groups()

    def decode_band(gy: int) -> np.ndarray:
        """Entropy-decode group row `gy` -> (rows<=gdim, wv, 3) f32 planes
        (pre-filter, visible-cropped)."""
        y0 = gy * gdim
        rows = min(gdim, hv - y0)
        num_ec = header.num_extra_channels
        if header.encoding == Encoding.MODULAR:
            band = np.zeros((3 + num_ec, rows, wv), np.int32)
            mg = frame.lf_global.modular_global
            from ..modular.channel import ModularChannel
            from ..modular.decode import ModularStreamId, decode_modular_subbitstream

            for gx in range(gx_count):
                g = gy * gx_count + gx
                x0 = gx * gdim
                cols = min(gdim, wv - x0)
                bufs = [
                    ModularChannel((cols, rows), (0, 0), meta.bit_depth.bits_per_sample)
                    for _ in range(3)
                ] + [
                    ModularChannel(
                        (cols, rows), (0, 0),
                        meta.extra_channel_info[i].bit_depth.bits_per_sample,
                    )
                    for i in range(num_ec)
                ]
                sec2 = frame._section_reader(
                    frame.section_index("hf", group=g, pass_idx=0), codestream, toc_end
                )
                decode_modular_subbitstream(
                    bufs,
                    ModularStreamId.modular_hf(header, 0, g),
                    None,
                    frame.lf_global.tree,
                    sec2,
                )
                for c in range(3 + num_ec):
                    band[c, :, x0 : x0 + cols] = bufs[c].data
            from ..render.simple import _modular_to_f32

            ec_planes = [
                _modular_to_f32(band[3 + i], meta.extra_channel_info[i].bit_depth)
                for i in range(num_ec)
            ]
            if meta.xyb_encoded:
                sx_f, sy_f, sb_f = frame.lf_global.lf_quant.quant_factors
                iy = band[0].astype(np.float32)
                ix = band[1].astype(np.float32)
                ib = band[2].astype(np.float32)
                return np.stack(
                    [
                        ix * np.float32(sx_f),
                        iy * np.float32(sy_f),
                        (ib + iy) * np.float32(sb_f),
                    ]
                ), ec_planes
            return np.stack(
                [_modular_to_f32(band[c], meta.bit_depth) for c in range(3)]
            ), ec_planes
        # VarDCT: render this band's groups from their coefficients
        from ..vardct.group import decode_vardct_group

        bw_blk, bh_blk = header.size_blocks()
        y1 = min(y0 + gdim, bh_blk * 8)
        band_planes = [
            np.zeros((y1 - y0, bw_blk * 8), np.float32) for _ in range(3)
        ]
        mg = frame.lf_global.modular_global
        # band planes for every hf-gridded coded buffer (EC outputs and
        # palette index channels alike)
        dec_bufs = {
            b: np.zeros((rows, wv), np.int32)
            for p in range(header.passes.num_passes)
            for b in mg.section_buffer_indices[2 + p]
        } if num_ec else {}
        frame.vardct_pixels = band_planes
        frame._band_block_y0 = y0 // 8
        try:
            for gx in range(gx_count):
                g = gy * gx_count + gx
                readers = [
                    (p, frame._section_reader(
                        frame.section_index("hf", group=g, pass_idx=p),
                        codestream, toc_end,
                    ))
                    for p in range(header.passes.num_passes)
                ]
                decode_vardct_group(frame, g, readers, render=True)
                if num_ec:
                    # EC channels follow the AC payload in the same
                    # sections (read_hf_stream order); band-local buffers
                    # replace the whole-image storage views
                    from ..modular.channel import ModularChannel
                    from ..modular.decode import (
                        ModularStreamId,
                        decode_modular_subbitstream,
                    )

                    for pass_idx, br2 in readers:
                        idxs = mg.section_buffer_indices[2 + pass_idx]
                        if not idxs:
                            continue
                        bufs, targets = [], []
                        for b in idxs:
                            info = mg.buffer_infos[b]
                            dx = gdim >> info.shift[0]
                            dy = gdim >> info.shift[1]
                            bx0, by0 = gx * dx, gy * dy
                            bwc = max(min(info.size[0] - bx0, dx), 0)
                            bhc = max(min(info.size[1] - by0, dy), 0)
                            if bwc == 0 or bhc == 0:
                                continue
                            mc = ModularChannel(
                                (bwc, bhc), (0, 0), info.bit_depth_bits
                            )
                            bufs.append(mc)
                            targets.append((b, bx0, bwc, bhc))
                        if not bufs:
                            continue
                        decode_modular_subbitstream(
                            bufs,
                            ModularStreamId.modular_hf(header, pass_idx, g),
                            None,
                            frame.lf_global.tree,
                            br2,
                        )
                        for mc, (b, bx0, bwc, bhc) in zip(bufs, targets):
                            dec_bufs[b][:bhc, bx0 : bx0 + bwc] = mc.data
        finally:
            frame.vardct_pixels = None
            frame._band_block_y0 = 0
        ec_band = [None] * num_ec
        for b, arr in dec_bufs.items():
            oc = mg.buffer_infos[b].output_channel_idx
            if oc is not None and oc >= 3:
                ec_band[oc - 3] = arr
        for step in mg.transform_steps:  # eligibility: zero-pred palettes
            from ..modular.transforms import _palette_lookup_vec

            idx_rows = dec_bufs[step.buf_in]
            palette = mg.storage[step.buf_pal].data
            bit_depth = min(mg.buffer_infos[step.buf_in].bit_depth_bits, 24)
            for c, bout in enumerate(step.buf_out):
                oc = mg.buffer_infos[bout].output_channel_idx
                if oc is not None and oc >= 3:
                    ec_band[oc - 3] = _palette_lookup_vec(
                        palette, idx_rows, c, step.num_colors, bit_depth
                    )
        from ..render.simple import _modular_to_f32

        ec_planes = [
            _modular_to_f32(ec_band[i], meta.extra_channel_info[i].bit_depth)
            for i in range(num_ec)
        ]
        return np.stack([p[:rows, :wv] for p in band_planes]), ec_planes

    # ---- band pipeline with one-band lookahead ---------------------------
    rf = header.restoration_filter
    have_filters = rf.gab or rf.epf_iters > 0
    sigma_block = None
    const_sigma = None
    if rf.epf_iters > 0:
        if header.encoding == Encoding.VARDCT:
            sigma_block = st.compute_sigma_image(frame)
        else:
            const_sigma = st.INV_SIGMA_NUM / rf.epf_sigma_for_modular

    from ..render.simple import color_transform

    noise = frame.lf_global.noise if header.has_noise else None

    def apply_noise(planes, y0: int, rows: int):
        """ConvolveNoise + AddNoise on band rows [y0, y0+rows): the field
        slab carries the 2-row convolve margin (real neighbor-group field
        rows — generated locally, the RNG seeds per subregion), so output
        rows are bit-identical to the whole-image noise stage."""
        from ..features.noise import (
            add_noise,
            convolve_noise,
            generate_noise_field_rows,
        )

        lo = max(0, y0 - 2)
        hi = min(hv, y0 + rows + 2)
        nf = generate_noise_field_rows(frame, lo, hi)
        off = y0 - lo
        conv = [convolve_noise(np, p)[off : off + rows] for p in nf]
        ccp = frame.lf_global.color_correlation_params
        return add_noise(np, planes, conv, noise, ccp)

    def finalize(gy: int, prev_tail, cur, next_head, ec=()):
        """Filter/noise/color/convert band `cur` using real neighbor rows;
        EC planes pass through untouched and append to the emitted stack."""
        y0 = gy * gdim
        if have_filters:
            top = prev_tail if prev_tail is not None else cur[:, :0]
            bot = next_head if next_head is not None else cur[:, :0]
            slab = np.concatenate([top, cur, bot], axis=1)
            pad_top = top.shape[1]
            chans = [slab[c] for c in range(3)]
            if rf.epf_iters > 0:
                if sigma_block is not None:
                    by0 = (y0 - pad_top) // 8
                    sig = st._expand_sigma(
                        np, sigma_block, slab.shape[1], slab.shape[2],
                        (0, y0 - pad_top),
                    )
                else:
                    sig = np.full(slab.shape[1:], np.float32(const_sigma))
            gw = (
                (rf.gab_x_weight1, rf.gab_x_weight2),
                (rf.gab_y_weight1, rf.gab_y_weight2),
                (rf.gab_b_weight1, rf.gab_b_weight2),
            )
            if rf.gab:
                chans = [st.gaborish(np, c, w1, w2) for c, (w1, w2) in zip(chans, gw)]
            rf_steps = [s for s, cond in ((0, rf.epf_iters >= 3), (1, rf.epf_iters >= 1), (2, rf.epf_iters >= 2)) if cond]
            for s in rf_steps:
                chans = st.epf_step_px(np, chans, sig, rf, s, pos=(0, y0 - pad_top))
            out = [c[pad_top : pad_top + cur.shape[1]] for c in chans]
        else:
            out = [cur[c] for c in range(3)]
        out = list(out)
        ec = list(ec)
        if not have_filters and (
            frame.lf_global.patches is not None
            or frame.lf_global.splines is not None
        ):
            # feature stages mutate in place; without the filter slab the
            # planes alias the decoded band (a later band's halo source)
            out = [p.copy() for p in out]
        patches = frame.lf_global.patches
        if patches is not None:
            # patches blend color+EC jointly (alpha channels participate)
            all_p = [np.ascontiguousarray(p) for p in out + ec]
            patches.apply_rows(
                all_p, y0, meta.extra_channel_info,
                frame.decoder_state.reference_frames,
            )
            out, ec = all_p[:3], all_p[3:]
        splines = frame.lf_global.splines
        if splines is not None:
            out = splines.draw_rows(out, y0)
        if noise is not None:
            out = apply_noise(out, y0, cur.shape[1])
        out = color_transform(frame, list(out))
        out = out + list(ec)
        if pixel_format != "f32":
            out = [
                st.convert_output(np, p, pixel_format, channel=i)
                for i, p in enumerate(out)
            ]
        emit(y0, np.stack(out, axis=-1))

    prev = None  # (gy, planes, ec_planes)
    prev_prev_tail = None
    for gy in range(gy_count):
        cur, cur_ec = decode_band(gy)
        if prev is not None:
            pgy, pplanes, pec = prev
            finalize(pgy, prev_prev_tail, pplanes, cur[:, :FILTER_HALO], pec)
            prev_prev_tail = pplanes[:, -FILTER_HALO:]
        prev = (gy, cur, cur_ec)
    pgy, pplanes, pec = prev
    finalize(pgy, prev_prev_tail, pplanes, None, pec)
    return {"width": wv, "height": hv, "bands": gy_count}
