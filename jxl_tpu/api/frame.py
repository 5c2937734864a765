"""Frame decoding orchestration (host planner).

Capability reference: jxl/src/frame/{mod,decode}.rs. Parses LfGlobal →
LF groups → HfGlobal → HF groups, dispatching modular/VarDCT section
decoding and producing channel planes for the render pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np

from ..errors import InvalidBitstream, LfQuantFactorTooSmall, NoLfFrame, NotSupported
from ..io.bit_reader import BitReader
from ..io.bundle import F16
from ..io.headers import ColorSpace, FileHeader
from ..io.headers.frame import Encoding, FrameHeader, FrameType, Toc
from ..modular.image import FullModularImage
from ..modular.tree import Tree

# LF quantization defaults (ref quant_weights.rs LF_QUANT)
LF_QUANT = (1.0 / 4096.0, 1.0 / 512.0, 1.0 / 256.0)


@dataclass
class LfQuantFactors:
    quant_factors: tuple = LF_QUANT

    @staticmethod
    def read(br: BitReader) -> "LfQuantFactors":
        if br.read(1) == 1:
            return LfQuantFactors()
        f16 = F16()
        qf = tuple(f16.read(br) / 128.0 for _ in range(3))
        for v in qf:
            if v < 1e-8:
                raise LfQuantFactorTooSmall("LF quant factor too small")
        return LfQuantFactors(qf)

    @property
    def inv_quant_factors(self):
        return tuple(1.0 / v for v in self.quant_factors)


@dataclass
class QuantizerParams:
    global_scale: int = 1
    quant_lf: int = 1

    GLOBAL_SCALE_DENOM = 1 << 16

    @staticmethod
    def read(br: BitReader) -> "QuantizerParams":
        sel = br.read(2)
        if sel == 0:
            gs = br.read(11) + 1
        elif sel == 1:
            gs = br.read(11) + 2049
        elif sel == 2:
            gs = br.read(12) + 4097
        else:
            gs = br.read(16) + 8193
        sel = br.read(2)
        if sel == 0:
            qlf = 16
        elif sel == 1:
            qlf = br.read(5) + 1
        elif sel == 2:
            qlf = br.read(8) + 1
        else:
            qlf = br.read(16) + 1
        return QuantizerParams(gs, qlf)

    @property
    def inv_global_scale(self) -> float:
        return self.GLOBAL_SCALE_DENOM / self.global_scale

    @property
    def inv_quant_lf(self) -> float:
        return self.inv_global_scale / self.quant_lf


@dataclass
class LfGlobalState:
    lf_quant: LfQuantFactors = None
    quant_params: QuantizerParams = None
    block_context_map: object = None
    color_correlation_params: object = None
    tree: Tree = None
    modular_global: FullModularImage = None
    patches: object = None
    splines: object = None
    noise: object = None


def _device_ac_profitable(header) -> bool:
    """Heuristic for JXL_TPU_AC=auto: the lane-lockstep device decoder
    amortizes its per-token step cost over the number of concurrently
    decoding sections; below this the native host path wins on one chip."""
    lanes = header.num_groups * header.passes.num_passes
    return lanes >= 64


class Frame:
    """One frame's decode state."""

    def __init__(self, header: FrameHeader, toc: Toc, file_header: FileHeader, decoder_state=None):
        self.header = header
        self.toc = toc
        self.file_header = file_header
        self.decoder_state = decoder_state
        meta = file_header.image_metadata
        is_gray = (
            not header.do_ycbcr
            and not meta.xyb_encoded
            and meta.color_encoding.color_space == ColorSpace.GRAY
        )
        self.color_channels = 1 if is_gray else 3
        self.lf_global: LfGlobalState | None = None
        self.hf_global = None
        self.lf_image = None  # [3] float planes in 8x8-block resolution
        self.hf_meta = None
        self.vardct_pixels = None  # decoded VarDCT group pixels, [3] planes
        self.render_after_decode = True  # run dequant+IDCT during group decode

    @property
    def modular_color_channels(self) -> int:
        return 0 if self.header.encoding == Encoding.VARDCT else self.color_channels

    # -- section handling ------------------------------------------------------

    def split_sections(self, br: BitReader) -> list[BitReader]:
        """Carve per-section readers out of `br` and undo TOC permutation."""
        stored = [br.split_at(n) for n in self.toc.entries]
        if not self.toc.permuted:
            return stored
        return [stored[self.toc.permutation[i]] for i in range(len(stored))]

    def section_index(self, kind: str, *, group: int = 0, pass_idx: int = 0) -> int:
        if self.header.num_toc_entries == 1:
            return 0
        if kind == "lf_global":
            return 0
        if kind == "lf":
            return 1 + group
        if kind == "hf_global":
            return self.header.num_lf_groups + 1
        if kind == "hf":
            return 2 + self.header.num_lf_groups + self.header.num_groups * pass_idx + group
        raise KeyError(kind)

    # -- LfGlobal ----------------------------------------------------------------

    def decode_lf_global(self, br: BitReader, allow_partial: bool = False) -> None:
        """ref frame/decode.rs:314-434. With allow_partial (progressive
        flush of an incomplete LfGlobal section), section-0 modular
        channels decode as far as the bytes allow; completed channels are
        kept (modular_global.early_render_ok gates rendering)."""
        header = self.header
        state = LfGlobalState()

        if header.has_patches:
            from ..features.patches import PatchesDictionary

            w, h = header.size_padded()
            ref_frames = self.decoder_state.reference_frames if self.decoder_state else [None] * 4
            state.patches = PatchesDictionary.read(
                br, w, h, len(self.file_header.image_metadata.extra_channel_info), ref_frames
            )
        if header.has_splines:
            from ..features.splines import Splines

            state.splines = Splines.read(br, header.width * header.height)
        if header.has_noise:
            from ..features.noise import Noise

            state.noise = Noise.read(br)

        is_vardct = header.encoding == Encoding.VARDCT
        num_ec = len(self.file_header.image_metadata.extra_channel_info)
        size_limit = min(
            1024
            + header.width * header.height * (self.color_channels + num_ec) // 16,
            1 << 22,
        )
        res = None
        if not allow_partial:
            # one native call for the whole table sequence (lf-quant,
            # quantizer, block ctx map, CfL, global tree); the Python
            # readers below are the oracle/fallback (and keep the exact
            # OutOfBounds size hints for truncated progressive flushes)
            from .. import native

            res = native.decode_lf_global_tables_native(br, is_vardct, size_limit)
        if res is not None:
            state.lf_quant = LfQuantFactors(res["lf_quant"])
            if is_vardct:
                from ..vardct.block_context import BlockContextMap
                from ..vardct.cfl import ColorCorrelationParams

                gs, qlf = res["quant_params"]
                state.quant_params = QuantizerParams(gs, qlf)
                if res["bctx_default"]:
                    state.block_context_map = BlockContextMap.default()
                else:
                    state.block_context_map = BlockContextMap(
                        res["lf_thresholds"], res["qf_thresholds"],
                        res["bctx_map"], res["num_lf_contexts"],
                        res["bctx_num_contexts"],
                    )
                cf, bx, bb, yx, yb = res["cfl"]
                state.color_correlation_params = ColorCorrelationParams(
                    cf, bx, bb, yx, yb
                )
            state.tree = res["tree"]
        else:
            state.lf_quant = LfQuantFactors.read(br)

            if is_vardct:
                from ..vardct.block_context import BlockContextMap
                from ..vardct.cfl import ColorCorrelationParams

                state.quant_params = QuantizerParams.read(br)
                state.block_context_map = BlockContextMap.read(br)
                state.color_correlation_params = ColorCorrelationParams.read(br)

            if br.read(1) == 1:
                state.tree = Tree.read(br, size_limit)

        if state.splines is not None:
            w, h = header.size()
            state.splines.initialize_draw_cache(w, h, state.color_correlation_params)

        state.modular_global = FullModularImage.read(
            header,
            self.file_header.image_metadata,
            self.modular_color_channels,
            br,
        )
        state.modular_global.read_section0(
            header, state.tree, br, allow_partial=allow_partial
        )
        self.lf_global = state

    # -- LF group -------------------------------------------------------------------

    def decode_lf_group(self, group: int, br: BitReader) -> None:
        header = self.header
        state = self.lf_global
        if header.encoding == Encoding.VARDCT and not header.has_lf_frame:
            from ..vardct.lf import decode_vardct_lf, try_decode_lf_group

            if try_decode_lf_group(self, group, br):
                return  # native call covered LF coeffs + (empty) modular LF + HF metadata
            decode_vardct_lf(self, group, br)
        elif header.encoding == Encoding.VARDCT and header.has_lf_frame:
            self._adopt_lf_frame()
        state.modular_global.read_lf_stream(header, state.tree, group, br)
        if header.encoding == Encoding.VARDCT:
            from ..vardct.lf import decode_hf_metadata

            decode_hf_metadata(self, group, br)

    def _adopt_lf_frame(self) -> None:
        """has_lf_frame: the LF image comes from the stored lf_level+1
        frame instead of coded LF coefficients (ref decode.rs:744-750)."""
        if self.lf_image is not None and getattr(self, "_lf_adopted", False):
            return
        from ..vardct.lf import ensure_vardct_buffers

        ensure_vardct_buffers(self)
        lf = (
            self.decoder_state.lf_frames[self.header.lf_level]
            if self.decoder_state
            else None
        )
        if lf is None:
            raise NoLfFrame("frame references a missing LF frame")
        for c in range(3):
            dst = self.lf_image[c]
            src = np.asarray(lf[c])
            h = min(dst.shape[0], src.shape[0])
            w = min(dst.shape[1], src.shape[1])
            dst[:h, :w] = src[:h, :w]
        self._lf_adopted = True

    # -- HfGlobal ---------------------------------------------------------------------

    def decode_hf_global(self, br: BitReader) -> None:
        if self.header.encoding == Encoding.VARDCT:
            from ..vardct.hf_global import decode_hf_global

            self.hf_global = decode_hf_global(self, br)

    # -- HF group -----------------------------------------------------------------------

    def decode_hf_group(
        self,
        group: int,
        pass_readers: list[tuple[int, BitReader]],
        render: bool = True,
    ) -> None:
        from ..utils import trace

        with trace.span("frame.decode_hf_group"):
            self._decode_hf_group(group, pass_readers, render)
        trace.metrics.add("hf_group_sections", len(pass_readers))

    def _decode_hf_group(
        self,
        group: int,
        pass_readers: list[tuple[int, BitReader]],
        render: bool = True,
    ) -> None:
        state = self.lf_global
        if self.header.encoding == Encoding.VARDCT:
            from ..vardct.group import decode_vardct_group

            decode_vardct_group(self, group, pass_readers, render=render)
        for pass_idx, br in pass_readers:
            state.modular_global.read_hf_stream(
                self.header, state.tree, pass_idx, group, br
            )

    def render_group_from_coeffs(self, group: int) -> None:
        """Re-render a group's pixels from its accumulated coefficients
        (multi-pass progressive flush)."""
        from ..vardct.group import _BlockList, _render_group

        coeffs = self.hf_global.hf_coefficients.get(group)
        if coeffs is not None:
            _render_group(self, group, _BlockList(self, group), coeffs)

    # -- incremental section decode (streaming driver) -------------------------------------
    #
    # Section-availability scheduling (ref codestream_parser/frame_info.rs:
    # candidate_hf_sections/completed_passes gating :551-604): sections decode
    # as their bytes arrive, in dependency order — LfGlobal, LF groups,
    # HfGlobal, then per-group HF passes in pass order.

    def begin_sections(self) -> None:
        n = len(self.toc.entries)
        ends = []
        acc = 0
        for e in self.toc.entries:
            acc += e
            ends.append(acc)
        self._stored_end = ends  # byte end of each stored section, rel. TOC end
        self._sec_decoded = [False] * n
        self._lf_finalized = False
        self._passes_done = [0] * self.header.num_groups
        self._transforms_done = False

    def _section_end(self, logical: int) -> int:
        stored = self.toc.permutation[logical] if self.toc.permuted else logical
        return self._stored_end[stored]

    def _section_reader(self, logical: int, codestream: bytes, toc_end: int) -> BitReader:
        stored = self.toc.permutation[logical] if self.toc.permuted else logical
        start = self._stored_end[stored] - self.toc.entries[stored]
        return BitReader(codestream[toc_end + start : toc_end + self._stored_end[stored]])

    def process_sections_incremental(
        self, codestream: bytes, toc_end: int, avail: int
    ) -> int | None:
        """Decode every newly-available section. Returns None when the frame
        is fully decoded, else the absolute byte position needed next."""
        header = self.header
        rel_avail = avail - toc_end

        if header.num_toc_entries == 1:
            if rel_avail < self._stored_end[0]:
                return toc_end + self._stored_end[0]
            if not self._sec_decoded[0]:
                sec = self._section_reader(0, codestream, toc_end)
                self.decode_lf_global(sec)
                for g in range(header.num_lf_groups):
                    self.decode_lf_group(g, sec)
                self.decode_hf_global(sec)
                self.finalize_lf()
                self._maybe_enable_device_render()
                self._lf_finalized = True
                for g in range(header.num_groups):
                    self.decode_hf_group(
                        g, [(p, sec) for p in range(header.passes.num_passes)]
                    )
                    self._passes_done[g] = header.passes.num_passes
                self._sec_decoded[0] = True
            if not self._transforms_done:
                self._finish_device_render()
                self.lf_global.modular_global.run_transforms()
                self._transforms_done = True
            return None

        def ready(logical):
            return not self._sec_decoded[logical] and rel_avail >= self._section_end(logical)

        i_lfg = self.section_index("lf_global")
        if self.lf_global is None:
            if not ready(i_lfg):
                return toc_end + self._section_end(i_lfg)
            self.decode_lf_global(self._section_reader(i_lfg, codestream, toc_end))
            self._sec_decoded[i_lfg] = True

        for g in range(header.num_lf_groups):
            i = self.section_index("lf", group=g)
            if ready(i):
                self.decode_lf_group(g, self._section_reader(i, codestream, toc_end))
                self._sec_decoded[i] = True

        i_hfg = self.section_index("hf_global")
        if ready(i_hfg):
            self.decode_hf_global(self._section_reader(i_hfg, codestream, toc_end))
            self._sec_decoded[i_hfg] = True

        lf_all = all(
            self._sec_decoded[self.section_index("lf", group=g)]
            for g in range(header.num_lf_groups)
        ) and self._sec_decoded[i_hfg]
        if lf_all and not self._lf_finalized:
            self.finalize_lf()
            self._maybe_enable_device_render()
            self._lf_finalized = True

        if self._lf_finalized:
            num_passes = header.passes.num_passes
            jobs = []
            for g in range(header.num_groups):
                readers = []
                p = self._passes_done[g]
                while p < num_passes:
                    i = self.section_index("hf", group=g, pass_idx=p)
                    if not ready(i):
                        break
                    readers.append((p, self._section_reader(i, codestream, toc_end)))
                    self._sec_decoded[i] = True
                    p += 1
                if readers:
                    self._passes_done[g] = p
                    jobs.append((g, readers, p == num_passes))
            if len(jobs) >= 2:
                self._decode_hf_groups_parallel(
                    [(g, r, last) for g, r, last in jobs]
                )
            else:
                for g, readers, last in jobs:
                    self.decode_hf_group(g, readers, render=last)

        if all(self._sec_decoded):
            if not self._transforms_done:
                self._finish_device_render()
                self.lf_global.modular_global.run_transforms()
                self._transforms_done = True
            return None
        # need the earliest undecoded section's bytes
        need = min(
            self._section_end(i) for i, d in enumerate(self._sec_decoded) if not d
        )
        return toc_end + max(need, rel_avail + 1)

    # -- whole-frame decode (non-streaming driver) -----------------------------------------

    def _maybe_enable_device_render(self) -> None:
        """After LF/HfGlobal: route the numeric VarDCT path (dequant + CfL
        + IDCT) to one whole-frame device program when eligible — planes
        stay device-resident into the filter program."""
        if self.header.encoding != Encoding.VARDCT:
            return
        if getattr(self, "_defer_render", False):
            return  # batched-animation path renders all frames in one program
        from ..utils.devhealth import device_fast

        if not device_fast():
            return  # tunnel-class/wedged device: the native host path wins
        h = self.header
        rf = h.restoration_filter
        has_filters = rf.gab or rf.epf_iters > 0
        fully_fusable = (
            not h.has_patches
            and not h.has_splines
            and not h.has_noise
            and h.upsampling == 1
            and h.frame_type != FrameType.REFERENCE_ONLY
            and not (h.can_be_referenced and h.save_before_ct)
            and h.lf_level == 0
        )
        # device planes must feed a device consumer: either the filter
        # chain or (for filterless frames) the fused color transform
        if not (has_filters or fully_fusable):
            return
        bw, bh = self.header.size_blocks()
        if bw * bh * 64 < 160_000:  # small frames stay on the host path
            return
        from ..vardct.device_frame import eligible

        if eligible(self):
            self.render_after_decode = False
            self._device_vardct = True

    def _finish_device_render(self) -> None:
        if not getattr(self, "_device_vardct", False):
            return
        from ..vardct.device_frame import (
            render_vardct_frame_device,
            render_vardct_frame_device_subsampled,
        )

        render = (
            render_vardct_frame_device
            if self.header.is444
            else render_vardct_frame_device_subsampled
        )
        flat = getattr(self, "_device_ac_flat", None)
        if flat is not None:
            self.vardct_pixels_dev = render(self, device_flat=flat)
            from ..vardct.device_group import check_device_ac_ok

            check_device_ac_ok(self)
        else:
            self.vardct_pixels_dev = render(self, self.hf_global.hf_coefficients)

    def decode_all_sections(self, br: BitReader) -> None:
        import contextlib

        from ..modular import device_lossless

        header = self.header
        # full-frame modular decode: batch gradient-only streams through
        # the device wavefront reconstruction (residual entropy on host,
        # async reconstruction on device, write-back at flush)
        dl_ctx = (
            device_lossless.BatchContext()
            if header.encoding == Encoding.MODULAR and device_lossless.enabled()
            else None
        )
        with (
            device_lossless.activate(dl_ctx)
            if dl_ctx is not None
            else contextlib.nullcontext()
        ):
            self._decode_all_sections_inner(br)
        if dl_ctx is not None:
            dl_ctx.flush()
        self.lf_global.modular_global.run_transforms()

    def _maybe_enable_host_wholeframe(self) -> None:
        """When the device render is not engaged, large multi-group VarDCT
        frames defer per-group IDCT and render the whole frame in one
        host pass (render_vardct_frame_host): per-group numpy glue and
        small einsum batches amortize frame-wide."""
        if getattr(self, "_device_vardct", False) or not self.render_after_decode:
            return
        if self.header.encoding != Encoding.VARDCT:
            return
        if self.header.num_groups < 2:
            return
        self.render_after_decode = False
        self._host_wholeframe = True

    def _decode_all_sections_inner(self, br: BitReader) -> None:
        header = self.header
        if header.num_toc_entries == 1:
            sec = self.split_sections(br)[0]
            self.decode_lf_global(sec)
            for g in range(header.num_lf_groups):
                self.decode_lf_group(g, sec)
            self.decode_hf_global(sec)
            self.finalize_lf()
            self._maybe_enable_device_render()
            self._maybe_enable_host_wholeframe()
            from ..vardct.group import try_decode_hf_groups

            if not try_decode_hf_groups(
                self, [(g, sec) for g in range(header.num_groups)]
            ):
                for g in range(header.num_groups):
                    self.decode_hf_group(
                        g, [(p, sec) for p in range(header.passes.num_passes)]
                    )
        else:
            sections = self.split_sections(br)
            self.decode_lf_global(sections[self.section_index("lf_global")])
            for g in range(header.num_lf_groups):
                self.decode_lf_group(g, sections[self.section_index("lf", group=g)])
            self.decode_hf_global(sections[self.section_index("hf_global")])
            self.finalize_lf()
            self._maybe_enable_device_render()
            self._maybe_enable_host_wholeframe()
            if not self._try_device_ac(sections):
                from ..vardct.group import try_decode_hf_groups

                hf_readers = (
                    [
                        (g, sections[self.section_index("hf", group=g, pass_idx=0)])
                        for g in range(header.num_groups)
                    ]
                    if header.passes.num_passes == 1
                    else None
                )
                if hf_readers is None or not try_decode_hf_groups(self, hf_readers):
                    jobs = [
                        (
                            g,
                            [
                                (p, sections[self.section_index("hf", group=g, pass_idx=p)])
                                for p in range(header.passes.num_passes)
                            ],
                        )
                        for g in range(header.num_groups)
                    ]
                    self._decode_hf_groups_parallel(jobs)
        self._finish_device_render()
        if getattr(self, "_host_wholeframe", False):
            from ..vardct.group import render_vardct_frame_host

            render_vardct_frame_host(self)
            self._host_wholeframe = False

    def _decode_hf_groups_parallel(self, jobs) -> None:
        """Fan HF-group section decoding out over a host thread pool (the
        reference's work-stealing render fan-out, frame/render.rs:373-459).
        Per-group entropy runs in C++ with the GIL released, and groups
        write disjoint rects, so sections decode concurrently; pass order
        within a group is preserved inside each job."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        jobs = [j if len(j) == 3 else (j[0], j[1], True) for j in jobs]
        n_workers = min(len(jobs), int(os.environ.get("JXL_TPU_THREADS", "0")) or (os.cpu_count() or 1))
        if len(jobs) < 2 or n_workers < 2:
            for g, readers, render in jobs:
                self.decode_hf_group(g, readers, render=render)
            return
        if self.header.encoding == Encoding.VARDCT and any(r for _, _, r in jobs):
            from ..vardct.group import ensure_pixel_buffers

            ensure_pixel_buffers(self)  # allocate once, outside the race
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            futs = [
                ex.submit(self.decode_hf_group, g, r, render)
                for g, r, render in jobs
            ]
            for f in futs:
                f.result()

    def _try_device_ac(self, sections) -> bool:
        """Decode all HF sections' AC coefficients on device (lanes =
        sections); see vardct/device_group.py. Falls back to the host
        path (returns False) for ineligible frames."""
        import os

        mode = os.environ.get("JXL_TPU_AC", "auto")
        if mode == "host":
            return False
        from ..vardct.device_group import (
            decode_ac_sections_device,
            eligible_for_device_ac,
        )

        if not eligible_for_device_ac(self):
            return False
        header = self.header
        if mode == "auto" and not _device_ac_profitable(header):
            return False
        readers = {
            (g, p): sections[self.section_index("hf", group=g, pass_idx=p)]
            for g in range(header.num_groups)
            for p in range(header.passes.num_passes)
        }
        return decode_ac_sections_device(self, readers)

    def finalize_lf(self) -> None:
        if self.header.should_do_adaptive_lf_smoothing and self.lf_image is not None:
            from ..vardct.lf import adaptive_lf_smoothing

            adaptive_lf_smoothing(self)

    # -- outputs ---------------------------------------------------------------------------

    def modular_channel(self, idx: int) -> np.ndarray:
        return self.lf_global.modular_global.output_channel(idx)
