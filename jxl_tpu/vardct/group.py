"""VarDCT HF group decode: per-block nonzero prediction, coefficient rANS
decode in coded order, cross-pass accumulation, dequant with CfL and
quant-bias, and inverse transform to pixels.

Capability reference: jxl/src/frame/group.rs. The coefficient entropy loop
runs natively (jxl_tpu/native, verified bit-exact vs the Python oracle
below); the numeric part (dequant + CfL + IDCT) is batched numpy/JAX.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..entropy import SymbolReader
from ..errors import EndOfBlockResidualNonZeros, InvalidBitstream, InvalidHistogramIndex, InvalidNumNonZeros, NativeDecodeError
from .block_context import zero_density_context
from .cfl import COLOR_TILE_DIM_IN_BLOCKS
from .transform_map import (
    block_shape_id,
    covered_blocks_x,
    covered_blocks_y,
)
from .transforms import transform_to_pixels

BLOCK_DIM = 8
BLOCK_SIZE = 64
GROUP_DIM = 256


def _ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def _predict_num_nonzeros(nzeros, bx, by):
    if bx == 0:
        return 32 if by == 0 else int(nzeros[by - 1][0])
    if by == 0:
        return int(nzeros[by][bx - 1])
    return (int(nzeros[by - 1][bx]) + int(nzeros[by][bx - 1]) + 1) // 2


def ensure_pixel_buffers(frame) -> None:
    if frame.vardct_pixels is None:
        bw, bh = frame.header.size_blocks()
        frame.vardct_pixels = [
            np.zeros(
                (
                    (bh * BLOCK_DIM) >> frame.header.vshift(c),
                    (bw * BLOCK_DIM) >> frame.header.hshift(c),
                ),
                dtype=np.float32,
            )
            for c in range(3)
        ]


def adjust_quant_bias(quant: np.ndarray, c: int, biases) -> np.ndarray:
    """ref group.rs:85-97."""
    q = quant.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        adjusted = np.where(quant == 0, 0.0, q - np.float32(biases[3]) / q)
    return np.where(np.abs(quant) < 2, q * np.float32(biases[c]), adjusted).astype(
        np.float32
    )


_CBX_ARR = np.array([covered_blocks_x(t) for t in range(27)], dtype=np.int32)
_CBY_ARR = np.array([covered_blocks_y(t) for t in range(27)], dtype=np.int32)
_SHAPE_ARR = np.array([block_shape_id(t) for t in range(27)], dtype=np.int32)


class _BlockList:
    """Geometry of all transform blocks in a group, precomputed once.

    Vectorized over the group's transform map: per-block arrays (raster
    order, matching the reference's by/bx scan in frame/group.rs:418).
    """

    def __init__(self, frame, group):
        header = frame.header
        hf = frame.hf_meta
        (gx0, gy0), (gw, gh) = header.block_group_rect(group)
        self.origin = (gx0, gy0)
        self.size = (gw, gh)
        self.hshift = [header.hshift(c) for c in range(3)]
        self.vshift = [header.vshift(c) for c in range(3)]
        region = np.asarray(hf["transform"][gy0 : gy0 + gh, gx0 : gx0 + gw])
        bys, bxs = np.nonzero(region >= 128)
        self.bys = bys.astype(np.int32)
        self.bxs = bxs.astype(np.int32)
        self.tids = (region[bys, bxs] & 127).astype(np.int32)
        self.cxs = _CBX_ARR[self.tids]
        self.cys = _CBY_ARR[self.tids]
        self.shape_ids = _SHAPE_ARR[self.tids]
        sizes = self.cxs * self.cys * BLOCK_SIZE
        self.offs = np.zeros(len(sizes), dtype=np.int32)
        if len(sizes) > 1:
            np.cumsum(sizes[:-1], out=self.offs[1:])
        self._pass_cache = {}

    @property
    def blocks(self):
        """(bx, by, tid, cx, cy, shape_id, coeffs_offset) tuples (oracle path)."""
        return list(
            zip(
                self.bxs.tolist(), self.bys.tolist(), self.tids.tolist(),
                self.cxs.tolist(), self.cys.tolist(), self.shape_ids.tolist(),
                self.offs.tolist(),
            )
        )


def try_decode_hf_groups(frame, group_readers: list) -> bool:
    """Whole-frame native HF-group decode: one C++ call decodes every
    group's AC section into a frame-wide coefficient pool (the native
    analog of the reference's decode fan-out, frame/render.rs:373-459).

    Eligible for single-pass VarDCT frames whose modular HF sections carry
    no channels (the dominant photo/animation case). Returns False when
    ineligible so the caller runs the per-group path; raises typed errors
    on invalid streams. `group_readers` is [(group_index, BitReader)] —
    for single-TOC frames all entries share one reader."""
    from ..io.headers.frame import Encoding as _Enc

    header = frame.header
    if header.encoding != _Enc.VARDCT or header.passes.num_passes != 1:
        return False
    from .. import native

    if not native.available():
        return False
    state = frame.lf_global
    mg = state.modular_global
    if any(len(s) > 0 for s in mg.section_buffer_indices[2:]):
        return False  # modular HF channels: per-group path handles them
    hf_global = frame.hf_global
    hf = frame.hf_meta
    if hf_global is None or hf is None:
        return False
    bctx = state.block_context_map
    pstate = hf_global.passes[0]

    tmap = hf["transform"]
    # coeff orders for the shapes present in this frame, concatenated with
    # a per-(shape, channel)-key offset LUT
    origin = tmap[tmap >= 128]
    tids = np.unique(origin).astype(np.int32) & 127
    shapes = np.unique(_SHAPE_ARR[tids]).tolist()
    order_off = np.zeros(13 * 3, dtype=np.int32)
    parts = []
    pos = 0
    for s in shapes:
        for c in range(3):
            k = int(s) * 3 + c
            arr = np.ascontiguousarray(pstate.coeff_orders[k], dtype=np.int32)
            order_off[k] = pos
            parts.append(arr)
            pos += len(arr)
    orders_arr = np.concatenate(parts) if parts else np.zeros(1, np.int32)

    n = len(group_readers)
    stride = header.group_dim * header.group_dim
    shared = getattr(frame, "_shared_coeff_pool", None)
    if shared is not None and shared[0].shape[2] == stride:
        # batched-animation caller provides one pool spanning all frames
        # (render reads it in place; no cross-frame concatenation)
        pool_arr, base_slot = shared
        slot_ids = list(range(base_slot, base_slot + n))
        pool = pool_arr[base_slot : base_slot + n]
    else:
        pool_arr = pool = np.zeros((n, 3, stride), dtype=np.int32)
        base_slot = 0
        slot_ids = list(range(n))
    bw, bh = header.size_blocks()
    gxc = header.size_groups()[0]
    shift = (
        header.passes.shift[0] if len(header.passes.shift) > 0 else 0
    )
    gdb = header.group_dim // 8
    blocks_out = np.empty((n, gdb * gdb, 4), dtype=np.int32)
    blk_counts = np.empty(n, dtype=np.int32)
    out_pos = native.decode_hf_groups_native(
        [sec for _, sec in group_readers],
        [g for g, _ in group_readers],
        slot_ids,
        bw, bh, gxc, header.group_dim // 8,
        np.array([header.hshift(c) for c in range(3)], dtype=np.int32),
        np.array([header.vshift(c) for c in range(3)], dtype=np.int32),
        np.ascontiguousarray(tmap),
        np.ascontiguousarray(hf["raw_quant"], dtype=np.int32),
        np.ascontiguousarray(hf["quant_lf"]),
        np.asarray(bctx.context_map, dtype=np.uint8),
        bctx.num_contexts, bctx.num_lf_contexts,
        np.asarray(bctx.qf_thresholds, dtype=np.int32),
        bctx.num_ac_contexts, hf_global.num_histograms,
        _CBX_ARR, _CBY_ARR, _SHAPE_ARR,
        native.pack_entropy(pstate.histograms),
        orders_arr, order_off, shift, pool_arr, stride,
        blocks_out, blk_counts,
    )
    if out_pos is None:
        return False
    slots = {}
    hf_global.block_tables = {}
    for i, (g, sec) in enumerate(group_readers):
        sec.pos = out_pos[i]
        hf_global.hf_coefficients[g] = pool_arr[slot_ids[i]]
        hf_global.block_tables[g] = blocks_out[i, : blk_counts[i]]
        slots[g] = slot_ids[i]
    if header.group_dim == GROUP_DIM:
        hf_global.coeff_pool = pool_arr
        hf_global.coeff_pool_slots = slots
    frame.render_after_decode = False
    if not getattr(frame, "_defer_render", False) and not getattr(
        frame, "_device_vardct", False
    ):
        frame._host_wholeframe = True
    from ..utils import trace

    trace.metrics.add("hf_group_sections", n)
    return True


def decode_vardct_group(frame, group: int, pass_readers: list, render: bool = True) -> None:
    header = frame.header
    lf_global = frame.lf_global
    hf_global = frame.hf_global
    hf = frame.hf_meta
    ensure_pixel_buffers(frame)

    bl = _BlockList(frame, group)
    (gx0, gy0) = bl.origin
    (gw, gh) = bl.size
    hshift, vshift = bl.hshift, bl.vshift
    bctx = lf_global.block_context_map
    num_histo_bits = _ceil_log2(hf_global.num_histograms)

    keep = header.passes.num_passes > 1 or not frame.render_after_decode
    if keep and group in hf_global.hf_coefficients:
        coeffs = hf_global.hf_coefficients[group]
    elif keep:
        # kept coefficients live in one frame-wide pool (slot-addressed
        # (G, 3, stride) views) so whole-frame render reads them in place
        # instead of concatenating hundreds of per-group arrays
        pool = getattr(hf_global, "coeff_pool", None)
        if pool is None:
            gxc, gyc = frame.header.size_groups()
            pool = np.zeros((gxc * gyc, 3, GROUP_DIM * GROUP_DIM), dtype=np.int32)
            hf_global.coeff_pool = pool
            hf_global.coeff_pool_slots = {}
        slots = hf_global.coeff_pool_slots
        slot = slots.setdefault(group, len(slots))
        coeffs = pool[slot]
        hf_global.hf_coefficients[group] = coeffs
    else:
        coeffs = np.zeros((3, GROUP_DIM * GROUP_DIM), dtype=np.int32)

    from .. import native

    use_native = native.available()

    rqmap = hf["raw_quant"]
    qlfmap = hf["quant_lf"]

    for pass_idx, br in pass_readers:
        histogram_index = br.read(num_histo_bits)
        if histogram_index >= hf_global.num_histograms:
            raise InvalidHistogramIndex("invalid histogram index")
        shift = (
            header.passes.shift[pass_idx] if pass_idx < len(header.passes.shift) else 0
        )
        pstate = hf_global.passes[pass_idx]
        ctx_off = histogram_index * bctx.num_ac_contexts

        if use_native:
            _decode_pass_native(
                frame, bl, pstate, br, ctx_off, shift, coeffs, bctx, native
            )
        else:
            _decode_pass_oracle(frame, bl, pstate, br, ctx_off, shift, coeffs, bctx)

    if render and frame.render_after_decode:
        _render_group(frame, group, bl, coeffs)


def _scatter_blocks(outp, pix, bx, by):
    """Place (N, ph, pw) pixel blocks at (by*8, bx*8): native row-memcpy
    loop, or one fancy-index scatter as fallback (blocks never overlap,
    so assignment order is irrelevant)."""
    from .. import native

    if native.scatter_blocks_native(outp, np.asarray(pix, dtype=np.float32), bx, by):
        return
    n, ph, pw = pix.shape
    rows = by[:, None, None] * BLOCK_DIM + np.arange(ph)[None, :, None]
    cols = bx[:, None, None] * BLOCK_DIM + np.arange(pw)[None, None, :]
    outp[rows, cols] = pix


def _block_contexts(frame, bl, bctx, bx, by, tid, shape_id):
    (gx0, gy0) = bl.origin
    rq = int(frame.hf_meta["raw_quant"][gy0 + by, gx0 + bx])
    qlf = int(frame.hf_meta["quant_lf"][gy0 + by, gx0 + bx])
    return rq, qlf


def _build_pass_items(frame, bl, bctx):
    """Pass-independent item table for the native AC decoder, vectorized.

    Rows interleave channels (1, 0, 2) per block in raster order, matching
    the bitstream token order (ref frame/group.rs:418-446). Column 6
    (ctx_off) is filled per pass; column 7 holds an index into the ordered
    (shape_id, c) key list, rewritten to a byte offset once the pass's
    concatenated coeff orders are known.
    """
    hshift, vshift = bl.hshift, bl.vshift
    (gx0, gy0) = bl.origin
    hf = frame.hf_meta
    n = len(bl.tids)
    rq = np.asarray(hf["raw_quant"])[gy0 + bl.bys, gx0 + bl.bxs].astype(np.int64)
    qlf = np.asarray(hf["quant_lf"])[gy0 + bl.bys, gx0 + bl.bxs].astype(np.int64)
    if bctx.qf_thresholds:
        thr = np.asarray(bctx.qf_thresholds, dtype=np.int64)
        qf_idx = (rq[:, None] > thr[None, :]).sum(axis=1)
    else:
        qf_idx = np.zeros(n, dtype=np.int64)
    cmap = np.asarray(bctx.context_map, dtype=np.int32)
    nq1 = len(bctx.qf_thresholds) + 1
    num_blocks = bl.cxs * bl.cys
    num_coeffs = num_blocks * BLOCK_SIZE

    cols = np.zeros((n, 3, 11), dtype=np.int32)
    valid = np.zeros((n, 3), dtype=bool)
    keys = np.zeros((n, 3), dtype=np.int32)
    for j, c in enumerate((1, 0, 2)):
        hs, vs = hshift[c], vshift[c]
        sbx = bl.bxs >> hs
        sby = bl.bys >> vs
        valid[:, j] = ((sbx << hs) == bl.bxs) & ((sby << vs) == bl.bys)
        cidx = (c ^ 1) if c < 2 else 2
        midx = (cidx * 13 + bl.shape_ids.astype(np.int64)) * nq1 + qf_idx
        midx = midx * bctx.num_lf_contexts + qlf
        block_context = cmap[midx]
        keys[:, j] = bl.shape_ids * 3 + c
        cols[:, j, 0] = c
        cols[:, j, 1] = sbx
        cols[:, j, 2] = sby
        cols[:, j, 3] = num_blocks
        cols[:, j, 4] = num_coeffs
        cols[:, j, 5] = block_context
        cols[:, j, 8] = c * GROUP_DIM * GROUP_DIM + bl.offs
        cols[:, j, 9] = bl.cxs
        cols[:, j, 10] = bl.cys
    vmask = valid.reshape(-1)
    items = cols.reshape(-1, 11)[vmask]
    flat_keys = keys.reshape(-1)[vmask]
    # (shape_id, c) keys in first-occurrence order; order lengths are fixed
    # per shape so the concatenated-offset layout is identical across passes
    _, first = np.unique(flat_keys, return_index=True)
    ordered_keys = flat_keys[np.sort(first)]
    return items, flat_keys, ordered_keys.tolist()


def _decode_pass_native(frame, bl, pstate, br, ctx_off, shift, coeffs, bctx, native):
    (gw, gh) = bl.size
    hshift, vshift = bl.hshift, bl.vshift

    cached = bl._pass_cache.get("items")
    if cached is None:
        cached = _build_pass_items(frame, bl, bctx)
        bl._pass_cache["items"] = cached
    items_base, flat_keys, ordered_keys = cached

    # per-pass: concatenated coeff orders for the keys, in key order
    pkey = id(pstate)
    pc = bl._pass_cache.get(pkey)
    if pc is None:
        order_parts = []
        offsets = {}
        pos = 0
        for k in ordered_keys:
            order = np.asarray(pstate.coeff_orders[k], dtype=np.int32)
            offsets[k] = pos
            order_parts.append(order)
            pos += len(order)
        orders_arr = (
            np.concatenate(order_parts) if order_parts else np.zeros(1, np.int32)
        )
        off_lut = np.zeros(max(ordered_keys, default=0) + 1, dtype=np.int32)
        for k, v in offsets.items():
            off_lut[k] = v
        pc = (orders_arr, off_lut)
        bl._pass_cache[pkey] = pc
    orders_arr, off_lut = pc

    items_arr = items_base.copy()
    items_arr[:, 6] = ctx_off
    items_arr[:, 7] = off_lut[flat_keys]

    nz_dims = np.zeros((3, 3), dtype=np.int32)
    off = 0
    for c in range(3):
        w = gw >> hshift[c]
        h = gh >> vshift[c]
        nz_dims[c] = (w, h, off)
        off += w * h
    nzeros_maps = np.zeros(max(off, 1), dtype=np.int32)

    ent = native.pack_entropy(pstate.histograms)
    lib = native.get_lib()
    bit_pos = ctypes.c_uint64(br.pos)
    ret = lib.jxl_decode_vardct_ac(
        native._databuf(br),
        ctypes.c_uint64(len(br.data)), ctypes.byref(bit_pos),
        ctypes.c_int(ent["use_prefix"]),
        native._ptr(ent["ans_tables"], ctypes.c_int32),
        ctypes.c_int(ent["table_size"]), ctypes.c_int(ent["log_bucket"]),
        native._ptr(ent["huff_offsets"], ctypes.c_int32),
        native._ptr(ent["huff_bits"], ctypes.c_int32),
        native._ptr(ent["huff_values"], ctypes.c_int32),
        native._ptr(ent["context_map"], ctypes.c_uint8),
        ctypes.c_int(len(ent["context_map"])),
        native._ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), native._ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]), ctypes.c_uint32(0),
        ctypes.c_int(len(items_arr)), native._ptr(items_arr, ctypes.c_int32),
        native._ptr(orders_arr, ctypes.c_int32),
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(shift), ctypes.c_int(bctx.num_contexts),
        native._ptr(nzeros_maps, ctypes.c_int32),
        native._ptr(nz_dims, ctypes.c_int32),
    )
    if ret != 0:
        raise NativeDecodeError(f"native vardct AC decode failed (code {ret})")
    br.pos = bit_pos.value


def _decode_pass_oracle(frame, bl, pstate, br, ctx_off, shift, coeffs, bctx):
    header = frame.header
    hshift, vshift = bl.hshift, bl.vshift
    (gw, gh) = bl.size
    reader = SymbolReader(pstate.histograms, br)
    histograms = pstate.histograms
    num_nzeros = [
        [[0] * (gw >> hshift[c]) for _ in range(gh >> vshift[c])] for c in range(3)
    ]
    for (bx, by, tid, cx, cy, shape_id, off) in bl.blocks:
        rq, qlf = _block_contexts(frame, bl, bctx, bx, by, tid, shape_id)
        num_blocks = cx * cy
        num_coeffs = num_blocks * BLOCK_SIZE
        log_num_blocks = num_blocks.bit_length() - 1
        sbx = [bx >> hshift[c] for c in range(3)]
        sby = [by >> vshift[c] for c in range(3)]
        for c in (1, 0, 2):
            if (sbx[c] << hshift[c]) != bx or (sby[c] << vshift[c]) != by:
                continue
            nz = num_nzeros[c]
            predicted = _predict_num_nonzeros(nz, sbx[c], sby[c])
            block_context = bctx.block_context(qlf, rq, shape_id, c)
            nonzero_ctx = bctx.nonzero_context(predicted, block_context) + ctx_off
            nonzeros = reader.read_unsigned(histograms, br, nonzero_ctx)
            if nonzeros + num_blocks > num_coeffs:
                raise InvalidNumNonZeros("invalid number of nonzeros")
            fill = -(-nonzeros // num_blocks)
            for iy in range(cy):
                row = nz[sby[c] + iy]
                for ix in range(cx):
                    row[sbx[c] + ix] = fill
            histo_off = bctx.zero_density_context_offset(block_context) + ctx_off
            prev = 0 if nonzeros > (num_coeffs >> 4) else 1
            order = pstate.coeff_orders[shape_id * 3 + c]
            cbuf = coeffs[c]
            for k in range(num_blocks, num_coeffs):
                if nonzeros == 0:
                    break
                ctx = histo_off + zero_density_context(nonzeros, k, log_num_blocks, prev)
                coeff = reader.read_signed(histograms, br, ctx) << shift
                prev = 1 if coeff != 0 else 0
                nonzeros -= prev
                cbuf[off + order[k]] += coeff
            if nonzeros != 0:
                raise EndOfBlockResidualNonZeros("end-of-block residual nonzeros")
    reader.check_final_state(histograms, br)


def render_vardct_frame_host(frame) -> None:
    """Whole-frame host render: dequant + CfL + IDCT bucketed by
    transform type across ALL groups in one pass (the numpy twin of
    vardct/device_frame.py). Per-group glue and small einsum batches
    amortize frame-wide — ~15% of host photo decode vs the per-group
    loop. Consumes frame.hf_global.hf_coefficients (groups decoded with
    render_after_decode=False)."""
    import types

    header = frame.header
    hfc = frame.hf_global.hf_coefficients
    ensure_pixel_buffers(frame)
    groups = sorted(hfc)
    stride = GROUP_DIM * GROUP_DIM
    pool = getattr(frame.hf_global, "coeff_pool", None)
    slots = getattr(frame.hf_global, "coeff_pool_slots", None)
    pooled = pool is not None and slots is not None and all(g in slots for g in groups)
    tables = getattr(frame.hf_global, "block_tables", None)
    if tables is not None and not all(g in tables for g in groups):
        tables = None
    bxs, bys, tids, offs = [], [], [], []
    for slot, g in enumerate(groups):
        if tables is not None:
            # block tables exported by the native HF-groups driver:
            # rows [gbx, gby, tid, group-local coeff off] in raster order
            t = tables[g]
            bxs.append(t[:, 0])
            bys.append(t[:, 1])
            tids.append(t[:, 2])
            t_offs = t[:, 3]
        else:
            bl = _BlockList(frame, g)
            (gx0, gy0) = bl.origin
            bxs.append(bl.bxs + np.int32(gx0))
            bys.append(bl.bys + np.int32(gy0))
            tids.append(bl.tids)
            t_offs = bl.offs
        if pooled:
            # address straight into the frame pool: (slot, c, off) lives at
            # slot*3*stride + c*stride + off; channel views below are the
            # flat pool shifted by c*stride, so no concatenation happens
            offs.append(t_offs.astype(np.int64) + np.int64(slots[g] * 3 * stride))
        else:
            offs.append(t_offs + np.int32(slot * stride))
    if not bxs:
        return
    union = types.SimpleNamespace(
        origin=(0, 0),
        hshift=[header.hshift(c) for c in range(3)],
        vshift=[header.vshift(c) for c in range(3)],
        bxs=np.concatenate(bxs),
        bys=np.concatenate(bys),
        tids=np.concatenate(tids),
        offs=np.concatenate(offs),
    )
    if pooled:
        flat = pool.reshape(-1)
        coeffs = [flat, flat[stride:], flat[2 * stride:]]
    else:
        coeffs = np.concatenate([hfc[g] for g in groups], axis=1)
    _render_group(frame, None, union, coeffs)
    if header.passes.num_passes == 1:
        hfc.clear()
        frame.hf_global.coeff_pool = None
        frame.hf_global.coeff_pool_slots = None


def _render_group(frame, group, bl, coeffs):
    """Numeric part: dequant + CfL + IDCT, batched per transform type.

    Blocks of each type run as a few einsums over (N, ...) batches — the
    same program the TPU device path compiles (see transforms_batch.py).
    """
    header = frame.header
    lf_global = frame.lf_global
    hf_global = frame.hf_global
    hf = frame.hf_meta
    (gx0, gy0) = bl.origin
    hshift, vshift = bl.hshift, bl.vshift
    ccp = lf_global.color_correlation_params
    qp = lf_global.quant_params
    inv_global_scale = qp.inv_global_scale
    quant_biases = np.asarray(
        frame.file_header.transform_data.opsin_inverse_matrix.quant_biases,
        dtype=np.float32,
    )
    dqm = hf_global.dequant_matrices
    x_dm = np.float32((1.0 / 1.25) ** (header.x_qm_scale - 2.0))
    b_dm = np.float32((1.0 / 1.25) ** (header.b_qm_scale - 2.0))
    ytox, ytob = hf["ytox"], hf["ytob"]
    rqmap = hf["raw_quant"]
    is444 = header.is444

    from .transforms_batch import transform_to_pixels_batch

    # bucket blocks by transform type (vectorized over the block arrays)
    for tid in np.unique(bl.tids).tolist():
        m = bl.tids == tid
        cx = covered_blocks_x(tid)
        cy = covered_blocks_y(tid)
        num_coeffs = cx * cy * BLOCK_SIZE
        n = int(m.sum())
        bxs = bl.bxs[m]
        bys = bl.bys[m]
        offs = bl.offs[m]
        gbx = bxs + gx0
        gby = bys + gy0
        tx = gbx // COLOR_TILE_DIM_IN_BLOCKS
        ty = gby // COLOR_TILE_DIM_IN_BLOCKS
        x_cc = (
            ccp.base_correlation_x
            + ytox[ty, tx].astype(np.float32) / ccp.color_factor
        )
        b_cc = (
            ccp.base_correlation_b
            + ytob[ty, tx].astype(np.float32) / ccp.color_factor
        )
        rq = rqmap[gby, gbx].astype(np.float32)
        scaled_y = np.float32(inv_global_scale) / rq  # (N,)

        mats = dqm.matrix3(tid, num_coeffs)  # (3, nc), memoized
        scales = np.stack([scaled_y * x_dm, scaled_y, scaled_y * b_dm], axis=1)  # (N,3)
        from .. import native

        oby0 = getattr(frame, "_band_block_y0", 0)
        if (
            is444
            and cx == 1
            and cy == 1
            and tid == 0  # plain DCT8
            and native.available()
            and all(
                p.flags.c_contiguous and p.dtype == np.float32
                for p in frame.vardct_pixels[:3]
            )
            and all(c.flags.c_contiguous for c in coeffs[:3])
        ):
            # fused native kernel: dequant+CfL+IDCT8+scatter in one pass —
            # no (N,3,64) temporaries, no sgemm, no fancy-index scatter
            from .transforms import idct_matrix

            lf3 = np.ascontiguousarray(
                np.stack([frame.lf_image[c][gby, gbx] for c in range(3)]),
                dtype=np.float32,
            )
            native.dct8_fused_native(
                coeffs[:3],
                np.ascontiguousarray(offs, dtype=np.int64),
                np.ascontiguousarray(scales, dtype=np.float32),
                np.ascontiguousarray(x_cc, dtype=np.float32),
                np.ascontiguousarray(b_cc, dtype=np.float32),
                np.ascontiguousarray(mats, dtype=np.float32),
                quant_biases,
                lf3,
                np.ascontiguousarray(idct_matrix(8), dtype=np.float32),
                [frame.vardct_pixels[c] for c in range(3)],
                np.ascontiguousarray(gbx, dtype=np.int32),
                np.ascontiguousarray(gby - oby0, dtype=np.int32),
            )
            continue

        dq = native.dequant_cfl_native(
            coeffs, offs, num_coeffs, mats, scales, x_cc, b_cc, quant_biases
        )
        if dq is None:
            # gather quantized coefficients: (N, 3, num_coeffs)
            idx = offs[:, None] + np.arange(num_coeffs)[None, :]
            qb = np.stack([coeffs[c][idx] for c in range(3)], axis=1)
            q = qb.astype(np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                adj = np.where(qb == 0, 0.0, q - quant_biases[3] / q)
            adj = np.where(np.abs(qb) < 2, q * quant_biases[None, :3, None], adj).astype(np.float32)
            dq = adj * mats[None] * scales[:, :, None]
            dq[:, 0] += x_cc[:, None] * dq[:, 1]
            dq[:, 2] += b_cc[:, None] * dq[:, 1]

        if is444 and cx == 1 and cy == 1:
            # 444 single-block types: one (3N, nc) transform for all
            # channels (one sgemm on the dense path) + per-channel scatter
            tiles3 = np.stack(
                [frame.lf_image[c][gby, gbx] for c in range(3)], axis=1
            ).reshape(3 * n, 1, 1)
            pix3 = transform_to_pixels_batch(
                np, tid, tiles3, np.ascontiguousarray(dq).reshape(3 * n, num_coeffs)
            )
            ph, pw = pix3.shape[1], pix3.shape[2]
            pix3 = pix3.reshape(n, 3, ph, pw)
            for c in range(3):
                outp = frame.vardct_pixels[c]
                if ph == BLOCK_DIM and pw == BLOCK_DIM:
                    oh, ow = outp.shape
                    v = outp.reshape(
                        oh // BLOCK_DIM, BLOCK_DIM, ow // BLOCK_DIM, BLOCK_DIM
                    )
                    v[gby - oby0, :, gbx, :] = pix3[:, c]
                else:
                    _scatter_blocks(outp, pix3[:, c], gbx, gby - oby0)
            continue

        for c in (1, 0, 2):
            if is444:
                sel = np.arange(n)
                lfx = gbx
                lfy = gby
            else:
                mask = ((gbx >> hshift[c]) << hshift[c] == gbx) & (
                    (gby >> vshift[c]) << vshift[c] == gby
                )
                # chroma decodes only at aligned blocks; big blocks are 444-only
                mask &= ((bxs >> hshift[c]) << hshift[c] == bxs) & (
                    (bys >> vshift[c]) << vshift[c] == bys
                )
                sel = np.nonzero(mask)[0]
                if len(sel) == 0:
                    continue
                lfx = gbx[sel] >> hshift[c]
                lfy = gby[sel] >> vshift[c]
            # LF tiles: (Nc, cy, cx)
            lf_plane = frame.lf_image[c]
            outp = frame.vardct_pixels[c]
            # banded decode (api/banded.py) renders into a group-row band:
            # output rows shift down by the band origin (inputs — LF, CfL
            # tiles, raw_quant — stay absolute)
            oby = getattr(frame, "_band_block_y0", 0)
            if cx == 1 and cy == 1:
                # dominant case (DCT8/DCT4x4/DCT2/identity/AFV): fully
                # vectorized gather + scatter, no per-block python loop
                tiles = lf_plane[lfy, lfx][:, None, None]
                pix = transform_to_pixels_batch(np, tid, tiles, dq[sel, c])
                ph, pw = pix.shape[1], pix.shape[2]
                if ph == BLOCK_DIM and pw == BLOCK_DIM:
                    oh, ow = outp.shape
                    v = outp.reshape(oh // BLOCK_DIM, BLOCK_DIM, ow // BLOCK_DIM, BLOCK_DIM)
                    v[lfy - oby, :, lfx, :] = pix
                    continue
                _scatter_blocks(outp, pix, lfx, lfy - oby)
                continue
            # vectorized (N, cy, cx) LF-tile gather (one fancy index, no
            # per-block np.stack) — large transforms dominate HDR photos
            iy = np.arange(cy)
            ix = np.arange(cx)
            tiles = lf_plane[
                lfy[:, None, None] + iy[None, :, None],
                lfx[:, None, None] + ix[None, None, :],
            ]
            pix = transform_to_pixels_batch(np, tid, tiles, dq[sel, c])
            _scatter_blocks(outp, pix, lfx, lfy - oby)
