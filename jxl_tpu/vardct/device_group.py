"""Host planner for the on-device VarDCT AC decode path.

Collects every HF section of a frame into lane arrays (streams, per-lane
contexts, per-group block metadata), dispatches ops/device_ac.py, and
leaves the decoded coefficients device-resident for the whole-frame
render program (device_frame.py) — coefficients never cross the host
wire in either direction.

Capability reference: jxl/src/frame/group.rs:384-618 (the decode loop)
+ frame/render.rs:148-503 (the fan-out this replaces). The native C++
host path remains the bit-exactness oracle; tests/test_device_ac.py
checks lane-for-lane equality over the corpus.
"""

from __future__ import annotations

import numpy as np

from ..io.headers.frame import Encoding
from .block_context import ZERO_DENSITY_CONTEXT_COUNT, ZERO_DENSITY_CONTEXT_LIMIT
from .group import _BlockList, _CBX_ARR, _CBY_ARR, BLOCK_SIZE, GROUP_DIM


# observability: frames decoded through the device AC path this process
STATS = {"device_ac_frames": 0}


def _ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def _next_pow2(n: int, floor: int = 1) -> int:
    return max(floor, 1 << max(0, (max(n, 1) - 1).bit_length()))


def eligible_for_device_ac(frame) -> bool:
    """Device AC decode covers frames whose HF sections contain only the
    VarDCT AC substream (no modular-HF channels: the host never needs the
    post-AC bit cursor), with ANS + no-LZ77 entropy in every pass."""
    if frame.header.encoding != Encoding.VARDCT:
        return False
    if not getattr(frame, "_device_vardct", False):
        return False
    hf_global = frame.hf_global
    if hf_global is None:
        return False
    mg = frame.lf_global.modular_global
    num_passes = frame.header.passes.num_passes
    if mg.buffer_infos and any(
        mg.section_buffer_indices[2 + p] for p in range(num_passes)
    ):
        return False
    for pstate in hf_global.passes:
        h = pstate.histograms
        if h.use_prefix_code or h.lz77_enabled:
            return False
    return True


def _group_items(frame, bl, bctx):
    """(n, 10) int32 pass-independent item table for one group, bitstream
    token order: per block (raster), channels (1, 0, 2), aligned only.
    Columns: c, sbx, sby, num_blocks, num_coeffs, bctx, order_key,
    coeffs_off, cx, cy — order_key is shape_id*3+c, rewritten to an
    offset into the shared per-pass orders array by the caller."""
    from .group import _build_pass_items

    cached = bl._pass_cache.get("items")
    if cached is None:
        cached = _build_pass_items(frame, bl, bctx)
        bl._pass_cache["items"] = cached
    items11, flat_keys, _ = cached
    n = len(items11)
    out = np.zeros((n, 10), dtype=np.int32)
    out[:, 0:6] = items11[:, 0:6]
    out[:, 6] = flat_keys  # order key, rewritten below
    out[:, 7] = items11[:, 8]  # coeffs_off (c*GD*GD + off)
    out[:, 8] = items11[:, 9]  # cx
    out[:, 9] = items11[:, 10]  # cy
    return out


def decode_ac_sections_device(frame, group_readers: dict) -> bool:
    """Decode all (group, pass) AC sections on device.

    group_readers: {(group, pass): BitReader} covering every group and
    pass of the frame. Returns True on success with the device coeff
    buffer stored at frame._device_ac_flat; False if ineligible (caller
    falls back to the host path). Raises InvalidBitstream on corrupt
    streams (after the device flags are checked)."""
    import jax.numpy as jnp

    from ..errors import InvalidBitstream, InvalidHistogramIndex, NativeDecodeError
    from ..ops.device_ac import decode_ac_sections
    from .. import native

    if not eligible_for_device_ac(frame):
        return False

    header = frame.header
    hf_global = frame.hf_global
    bctx = frame.lf_global.block_context_map
    num_passes = header.passes.num_passes
    num_groups = header.num_groups
    num_histo_bits = _ceil_log2(hf_global.num_histograms)

    # ---- per-pass shared tables -----------------------------------------
    # orders: one concatenated array over (pass, used order keys)
    used_keys = set()
    blists = []
    for g in range(num_groups):
        bl = _BlockList(frame, g)
        blists.append(bl)
        for sid in np.unique(bl.shape_ids).tolist():
            for c in range(3):
                used_keys.add(sid * 3 + c)
    used_keys = sorted(used_keys)

    order_parts = []
    pass_order_base = []
    key_lut = np.zeros(40, dtype=np.int32)
    pos = 0
    for pstate in hf_global.passes:
        pass_order_base.append(pos)
        for k in used_keys:
            order = np.asarray(pstate.coeff_orders[k], dtype=np.int32)
            if pstate is hf_global.passes[0]:
                key_lut[k] = pos - pass_order_base[0]
            order_parts.append(order)
            pos += len(order)
    orders = np.concatenate(order_parts) if order_parts else np.zeros(1, np.int32)
    # per-pass layout is identical (fixed order lengths per shape), so one
    # key_lut plus a per-lane pass base suffices

    # entropy tables must agree in bucket geometry across passes for one
    # flat (C, 5, NB) stack; pack each pass's clusters contiguously
    packs = [native.pack_entropy(p.histograms) for p in hf_global.passes]
    nb = packs[0]["table_size"]
    log_bucket = packs[0]["log_bucket"]
    for pk in packs[1:]:
        if pk["table_size"] != nb or pk["log_bucket"] != log_bucket:
            return False  # different alias geometries; rare — host path
    tables = np.concatenate([pk["ans_tables"] for pk in packs])  # (C_total,5,NB)
    uint_cfgs = np.concatenate([pk["uint_configs"] for pk in packs])
    cluster_base = np.cumsum([0] + [pk["ans_tables"].shape[0] for pk in packs])
    # context maps shifted per pass so one flat map serves all lanes
    pad = ZERO_DENSITY_CONTEXT_LIMIT - ZERO_DENSITY_CONTEXT_COUNT
    cmap_parts = []
    ctx_base = []
    cpos = 0
    for pi, pk in enumerate(packs):
        cm = pk["context_map"].astype(np.int32) + cluster_base[pi]
        ctx_base.append(cpos)
        cmap_parts.append(cm)
        cpos += len(cm)
    context_map = np.concatenate(cmap_parts)

    # ---- per-group item tables ------------------------------------------
    g_items = []
    for g in range(num_groups):
        it = _group_items(frame, blists[g], bctx)
        it[:, 6] = key_lut[it[:, 6]]
        g_items.append(it)
    i_max = _next_pow2(max((len(it) for it in g_items), default=1), 16)
    items = np.zeros((num_groups, i_max, 10), dtype=np.int32)
    n_items_per_group = np.zeros(num_groups, dtype=np.int32)
    for g, it in enumerate(g_items):
        items[g, : len(it)] = it
        n_items_per_group[g] = len(it)

    # ---- per-lane arrays -------------------------------------------------
    S = num_groups * num_passes
    lane_group = np.zeros(S, np.int32)
    lane_ctx_off = np.zeros(S, np.int32)
    lane_shift = np.zeros(S, np.int32)
    lane_order_base = np.zeros(S, np.int32)
    lane_coeff_base = np.zeros(S, np.int32)
    lane_n_items = np.zeros(S, np.int32)
    lane_end_bits = np.zeros(S, np.int32)
    start_bits = np.zeros(S, np.int32)
    datas = []
    li = 0
    for g in range(num_groups):
        for p in range(num_passes):
            br = group_readers[(g, p)]
            hist_idx = br.read(num_histo_bits)
            if hist_idx >= hf_global.num_histograms:
                raise InvalidHistogramIndex("invalid histogram index")
            lane_group[li] = g
            lane_ctx_off[li] = (
                hist_idx * bctx.num_ac_contexts + ctx_base[p]
            )
            lane_shift[li] = (
                header.passes.shift[p] if p < len(header.passes.shift) else 0
            )
            lane_order_base[li] = pass_order_base[p]
            lane_coeff_base[li] = g * 3 * GROUP_DIM * GROUP_DIM
            lane_n_items[li] = n_items_per_group[g]
            lane_end_bits[li] = len(br.data) * 8
            start_bits[li] = br.pos
            datas.append(bytes(br.data))
            li += 1

    l_max = _next_pow2(max(len(d) for d in datas) + 8, 64)
    streams = np.zeros((S, l_max), dtype=np.uint8)
    for i, d in enumerate(datas):
        streams[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)

    total = num_groups * 3 * GROUP_DIM * GROUP_DIM
    coeffs, ok = decode_ac_sections(
        jnp.asarray(streams),
        jnp.asarray(start_bits),
        jnp.asarray(lane_group),
        jnp.asarray(lane_ctx_off),
        jnp.asarray(lane_shift),
        jnp.asarray(lane_order_base),
        jnp.asarray(lane_coeff_base),
        jnp.asarray(lane_n_items),
        jnp.asarray(lane_end_bits),
        jnp.asarray(items),
        jnp.asarray(orders),
        jnp.asarray(tables),
        jnp.asarray(uint_cfgs),
        jnp.asarray(context_map),
        log_bucket=log_bucket,
        num_bctx=bctx.num_contexts,
        total=total,
        n_buckets=nb,
    )
    frame._device_ac_flat = coeffs
    frame._device_ac_ok = ok
    frame._device_ac_groups = list(range(num_groups))
    STATS["device_ac_frames"] += 1
    return True


def check_device_ac_ok(frame) -> None:
    """Force the validity flags (sync point) and raise on corrupt lanes."""
    from ..errors import InvalidBitstream, InvalidHistogramIndex, NativeDecodeError

    ok = getattr(frame, "_device_ac_ok", None)
    if ok is None:
        return
    flags = np.asarray(ok)
    frame._device_ac_ok = None
    if not flags.all():
        bad = np.nonzero(~flags)[0].tolist()
        raise NativeDecodeError(f"device AC decode failed for sections {bad}")
