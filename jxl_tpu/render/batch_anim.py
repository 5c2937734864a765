"""Whole-animation batched device render: every frame's VarDCT numeric
path + filters + color + output conversion in ONE device program with ONE
upload set and ONE readback.

Why: the tunnel to the chip charges ~60-115 ms per computed readback
(BASELINE.md), so per-frame device round trips lose badly for small
animation frames (48 readbacks ~ 5.5 s measured). Batching frames like a
second group axis amortizes everything: coefficients ship as one COO set,
frames IDCT-scatter into per-frame canvas bands, per-frame mirror padding
is a host-prepared gather, and the filter + color + u8 chain runs under
`jax.vmap` over the frame axis (per-frame mirror semantics preserved).

Eligibility: VarDCT 444 frames without features (patches/splines/noise),
upsampling 1, Replace/none blending, no reference/LF-frame use, identical
restoration-filter config, canvas <= 512^2. Anything else falls back to
the per-frame host path.

Capability reference: this replaces the per-frame loop of
frame/render.rs:148-503 for animations; the stage math is the same
single-frame code (render/stages/core.py) vmapped.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..io.headers.frame import BlendingMode, Encoding, FrameType

GROUP_PX = 256
BLOCK_SIZE = 64


def batchable(fh, frame_infos) -> bool:
    meta = fh.image_metadata
    if meta.animation is None or len(frame_infos) < 4:
        return False
    # extra channels decode host-side (tiny modular planes); spot colors
    # would need the spot stage, so they gate out
    for info in meta.extra_channel_info:
        if int(getattr(info, "ec_type", 0)) not in (0, 1):  # alpha / depth
            return False
    if fh.xsize * fh.ysize > 512 * 512:
        return False
    rf0 = None
    for header, *_ in frame_infos:
        if (
            header.encoding != Encoding.VARDCT
            or not header.is444
            or header.frame_type != FrameType.REGULAR
            or not header.is_visible
            or header.can_be_referenced
            or header.has_patches
            or header.has_splines
            or header.has_noise
            or header.upsampling != 1
            or header.lf_level != 0
            or header.has_lf_frame
        ):
            return False
        if header.needs_blending() and header.blending_info.mode != BlendingMode.REPLACE:
            return False
        if header.needs_blending() and any(
            bi.mode != BlendingMode.REPLACE for bi in header.ec_blending_info
        ):
            return False
        if any(u != 1 for u in header.ec_upsampling):
            return False
        rfk = _rf_fingerprint(header.restoration_filter)
        if rf0 is None:
            rf0 = rfk
        elif rfk != rf0:
            return False
        if header.x_qm_scale != frame_infos[0][0].x_qm_scale:
            return False
        if header.b_qm_scale != frame_infos[0][0].b_qm_scale:
            return False
    return True


def _rf_fingerprint(rf):
    return (
        bool(rf.gab), int(rf.epf_iters),
        float(rf.gab_x_weight1), float(rf.gab_x_weight2),
        float(rf.gab_y_weight1), float(rf.gab_y_weight2),
        float(rf.gab_b_weight1), float(rf.gab_b_weight2),
        float(rf.epf_sigma_for_modular),
    )


_CACHE: dict = {}


def render_frames_batched(frames: list, out_format: str):
    """frames: decoded Frame objects (sections done, render deferred,
    hf_coefficients retained). Returns (F, Hc, Wc, 3) numpy in
    `out_format`, each frame's content at its own (0, 0) (blending is the
    caller's job)."""
    from ..render import device_filters as df
    from ..render import simple as render_simple
    from ..render.stages import core as st
    from ..vardct.device_frame import _sparse_coeffs
    from ..vardct.group import _BlockList
    from ..vardct.transform_map import covered_blocks_x, covered_blocks_y
    from ..vardct.transforms_batch import transform_to_pixels_batch

    f0 = frames[0]
    fh = f0.file_header
    Wc, Hc = fh.xsize, fh.ysize
    cbw, cbh = -(-Wc // 8), -(-Hc // 8)
    Hp, Wp = cbh * 8, cbw * 8
    F = len(frames)
    biases = np.asarray(
        fh.transform_data.opsin_inverse_matrix.quant_biases, dtype=np.float32
    )

    # ---- host prep: global block tables over (frame, group) --------------
    by_tid: dict[int, list] = {}
    coeffs_by_gid: dict[int, np.ndarray] = {}
    lf_stack = np.zeros((3, F, cbh, cbw), np.float32)
    sigma = np.zeros((F, Hp, Wp), np.float32)
    pad_y = np.zeros((F, Hp), np.int32)
    pad_x = np.zeros((F, Wp), np.int32)
    gid = 0
    mats_key = []
    for fi, fr in enumerate(frames):
        header = fr.header
        bw, bh = header.size_blocks()
        lf_stack[:, fi, :bh, :bw] = np.stack(fr.lf_image)[:, :bh, :bw]
        rf = header.restoration_filter
        if rf.epf_iters > 0:
            sb = st.compute_sigma_image(fr)
            s = df._sigma_px(rf, sb, None, bh * 8, bw * 8)
            sigma[fi, : bh * 8, : bw * 8] = s
        # per-frame mirror-pad gather indices over the canvas; filters
        # mirror at the VISIBLE frame edge, not the 8-padded coded area
        # (matches the single-frame pipeline, verified vs libjxl)
        w_vis, h_vis = header.size_upsampled()
        pad_y[fi] = _mirror_idx(Hp, min(h_vis, Hp))
        pad_x[fi] = _mirror_idx(Wp, min(w_vis, Wp))

        qp = fr.lf_global.quant_params
        ccp = fr.lf_global.color_correlation_params
        igs = np.float32(qp.inv_global_scale)
        x_dm = np.float32((1.0 / 1.25) ** (header.x_qm_scale - 2.0))
        b_dm = np.float32((1.0 / 1.25) ** (header.b_qm_scale - 2.0))
        hf = fr.hf_meta
        rq = np.asarray(hf["raw_quant"])
        ytox, ytob = np.asarray(hf["ytox"]), np.asarray(hf["ytob"])
        for g in sorted(fr.hf_global.hf_coefficients):
            bl = _BlockList(fr, g)
            (gx0, gy0) = bl.origin
            coeffs_by_gid[gid] = fr.hf_global.hf_coefficients[g]
            gbx = bl.bxs + gx0
            gby = bl.bys + gy0
            rq_b = rq[gby, gbx].astype(np.float32)
            sy = igs / np.maximum(rq_b, 1e-9)
            scales = np.stack([sy * x_dm, sy, sy * b_dm], axis=1)  # (N, 3)
            tx = gbx // 8
            ty = gby // 8
            x_cc = (
                np.float32(ccp.base_correlation_x)
                + ytox[ty, tx].astype(np.float32) / np.float32(ccp.color_factor)
            )
            b_cc = (
                np.float32(ccp.base_correlation_b)
                + ytob[ty, tx].astype(np.float32) / np.float32(ccp.color_factor)
            )
            for t in np.unique(bl.tids).tolist():
                m = bl.tids == t
                rec = by_tid.setdefault(int(t), [])
                rec.append(
                    (
                        gbx[m], gby[m],
                        np.full(int(m.sum()), fi, np.int32),
                        np.full(int(m.sum()), gid, np.int32),
                        bl.offs[m], scales[m], x_cc[m], b_cc[m],
                    )
                )
            gid += 1
        mats_key.append(id(fr.hf_global.dequant_matrices))

    group_ids = list(range(gid))
    nz_mode, nz_idx, nz_vals, total, nz_bucket = _sparse_coeffs(
        coeffs_by_gid, group_ids
    )

    dqm = f0.hf_global.dequant_matrices
    tids = tuple(sorted(by_tid))
    ncs = {t: covered_blocks_x(t) * covered_blocks_y(t) * BLOCK_SIZE for t in tids}
    mats = {
        t: np.stack(
            [np.asarray(dqm.matrix(t, c)[: ncs[t]], np.float32) for c in range(3)]
        )
        for t in tids
    }
    # per-tid concatenated + padded argument arrays
    tid_args = []
    pads = []
    for t in tids:
        parts = by_tid[t]
        gbx = np.concatenate([p[0] for p in parts]).astype(np.int32)
        gby = np.concatenate([p[1] for p in parts]).astype(np.int32)
        fidx = np.concatenate([p[2] for p in parts])
        gidx = np.concatenate([p[3] for p in parts])
        off = np.concatenate([p[4] for p in parts]).astype(np.int32)
        scl = np.concatenate([p[5] for p in parts]).astype(np.float32)
        xcc = np.concatenate([p[6] for p in parts]).astype(np.float32)
        bcc = np.concatenate([p[7] for p in parts]).astype(np.float32)
        n = len(gbx)
        p2 = 1 << max(3, (n - 1).bit_length())
        pads.append(p2)
        if p2 > n:
            pad1 = lambda a, fill: np.concatenate(
                [a, np.full((p2 - n,) + a.shape[1:], fill, a.dtype)]
            )
            gbx, gby = pad1(gbx, 0), pad1(gby, 0)
            fidx, gidx, off = pad1(fidx, 0), pad1(gidx, 0), pad1(off, -1)
            scl, xcc, bcc = pad1(scl, 0), pad1(xcc, 0), pad1(bcc, 0)
        tid_args.append((gbx, gby, fidx, gidx, off, scl, xcc, bcc))

    rf = f0.header.restoration_filter
    key = (
        F, Hp, Wp, tids, tuple(pads), nz_mode, nz_bucket, gid, out_format,
        _rf_fingerprint(rf),
        tuple(float(b) for b in biases),
    )
    fn = _CACHE.get(key)
    if fn is None:
        fn = _build_program(
            f0, F, Hp, Wp, tids, ncs, mats, nz_mode, total, biases, out_format
        )
        _CACHE[key] = fn

    # one batched transfer for every input (per-array device_put calls pay
    # ~28 ms tunnel latency each; the pytree form batches them)
    args = jax.device_put(
        (nz_idx, nz_vals, lf_stack, sigma, pad_y, pad_x, tuple(tid_args))
    )
    out = fn(*args)
    return np.asarray(out)


def _mirror_idx(n_out: int, n_valid: int) -> np.ndarray:
    idx = np.arange(n_out)
    if n_valid <= 0:
        return np.zeros(n_out, np.int32)
    period = max(2 * n_valid, 1)
    m = idx % period
    m = np.where(m >= n_valid, period - 1 - m, m)
    return np.clip(m, 0, n_valid - 1).astype(np.int32)


def _build_program(
    f0, F, Hp, Wp, tids, ncs, mats, nz_mode, total, biases, out_format
):
    from ..render import device_filters as df
    from ..render import simple as render_simple
    from ..render.stages import core as st
    from ..vardct.device_frame import _unpack_coeffs_device
    from ..vardct.transform_map import covered_blocks_x, covered_blocks_y

    header = f0.header
    rf = header.restoration_filter
    gab_weights = df._gab_key(rf)
    epf_iters = int(rf.epf_iters)
    rfk = df._rf_key(rf)
    rf_obj = df._Rf()
    rf_obj.epf_channel_scale = list(rfk[0])
    rf_obj.epf_pass0_sigma_scale = rfk[1]
    rf_obj.epf_pass2_sigma_scale = rfk[2]
    rf_obj.epf_border_sad_mul = rfk[3]
    rf_obj.epf_sharp_lut = None
    mats_c = {t: jnp.asarray(mats[t]) for t in tids}
    b_c = jnp.asarray(biases)
    cbw = Wp // 8
    stride_g = 3 * GROUP_PX * GROUP_PX
    stride_c = GROUP_PX * GROUP_PX

    def program(nz_i, nz_v, lf, sigma, pad_y, pad_x, tid_args):
        flat = _unpack_coeffs_device(nz_mode, nz_i, nz_v, total)
        planes = jnp.zeros((3, F * Hp * Wp), jnp.float32)
        lf_flat = lf.reshape(3, -1)  # (3, F*cbh*cbw)
        for ti, t in enumerate(tids):
            gbx, gby, fidx, gidx, off, scl, xcc, bcc = tid_args[ti]
            nc = ncs[t]
            cx = covered_blocks_x(t)
            cy = covered_blocks_y(t)
            valid = off >= 0
            offc = jnp.maximum(off, 0)
            lanes = jnp.arange(nc, dtype=jnp.int32)
            gi = (
                (gidx * stride_g + offc)[:, None, None]
                + jnp.arange(3, dtype=jnp.int32)[None, :, None] * stride_c
                + lanes[None, None, :]
            )
            qb = jnp.take(flat, gi.reshape(-1), mode="clip").reshape(-1, 3, nc)
            q = qb.astype(jnp.float32)
            adj = jnp.where(
                jnp.abs(qb) < 2,
                q * b_c[:3][None, :, None],
                q - b_c[3] / jnp.where(qb == 0, 1.0, q),
            )
            adj = jnp.where(qb == 0, 0.0, adj)
            dq = adj * mats_c[t][None] * scl[:, :, None]
            dq = dq.at[:, 0].add(xcc[:, None] * dq[:, 1])
            dq = dq.at[:, 2].add(bcc[:, None] * dq[:, 1])
            iy = jnp.arange(cy, dtype=jnp.int32)
            ix = jnp.arange(cx, dtype=jnp.int32)
            cbh = Hp // 8
            lf_idx = (
                fidx[:, None, None] * (cbh * cbw)
                + (gby[:, None, None] + iy[None, :, None]) * cbw
                + gbx[:, None, None]
                + ix[None, None, :]
            ).reshape(-1)
            ph, pw = cy * 8, cx * 8
            py = jnp.arange(ph, dtype=jnp.int32)
            px = jnp.arange(pw, dtype=jnp.int32)
            pidx = (
                fidx[:, None, None] * (Hp * Wp)
                + (gby[:, None, None] * 8 + py[None, :, None]) * Wp
                + gbx[:, None, None] * 8
                + px[None, None, :]
            )
            pidx = jnp.where(valid[:, None, None], pidx, F * Hp * Wp).reshape(-1)
            for c in (1, 0, 2):
                tiles = jnp.take(lf_flat[c], lf_idx, mode="clip").reshape(-1, cy, cx)
                pix = transform_to_pixels_batch_jit(t, tiles, dq[:, c])
                planes = planes.at[c, pidx].set(pix.reshape(-1), mode="drop")
        stacked = planes.reshape(3, F, Hp, Wp).transpose(1, 0, 2, 3)

        def per_frame(p3, sig, py_idx, px_idx):
            # per-frame mirror padding: reflect the frame's own content
            # across the canvas slack so filter borders match the
            # single-frame pipeline. The gather re-applies BEFORE every
            # filter step: EPF's block-border SAD mask is position-based
            # (not mirror-symmetric), so filtered slack content is not the
            # mirror of filtered interior — stale halos drift by ~3e-3 at
            # visible edges of sub-canvas frames.
            def remirror(cs):
                return [c[py_idx[:, None], px_idx[None, :]] for c in cs]

            chans = remirror([p3[c] for c in range(3)])
            sig = sig[py_idx[:, None], px_idx[None, :]]
            if gab_weights is not None:
                chans = [
                    st.gaborish(jnp, c, w1, w2)
                    for c, (w1, w2) in zip(chans, gab_weights)
                ]
            if epf_iters >= 3:
                chans = st.epf_step_px(jnp, remirror(chans), sig, rf_obj, 0)
            if epf_iters >= 1:
                chans = st.epf_step_px(jnp, remirror(chans), sig, rf_obj, 1)
            if epf_iters >= 2:
                chans = st.epf_step_px(jnp, remirror(chans), sig, rf_obj, 2)
            chans = render_simple.color_transform(f0, chans, xp=jnp)
            if out_format != "f32":
                chans = [
                    st.convert_output(jnp, c, out_format, channel=i)
                    for i, c in enumerate(chans)
                ]
            return jnp.stack(chans, axis=-1)

        return jax.vmap(per_frame)(stacked, sigma, pad_y, pad_x)

    from ..vardct.transforms_batch import transform_to_pixels_batch

    def transform_to_pixels_batch_jit(t, tiles, dq):
        return transform_to_pixels_batch(jnp, t, tiles, dq)

    def wrapped(*args):
        with jax.default_matmul_precision("float32"):
            return program(*args)

    return jax.jit(wrapped)


def render_frames_batched_host(frames: list, out_format: str):
    """Cross-frame bucketed HOST render: the numpy twin of the device
    batched program above. The per-frame loop pays IDCT bucket glue
    (dequant/CfL setup, small-batch transforms) once per frame; here each
    transform type runs ONCE across every (frame, group) — one sgemm per
    type — then filters run per frame through the native C++ chain and
    the color/output conversion runs once over a frame-stacked plane.
    Same eligibility (`batchable`) and caller contract as
    render_frames_batched: returns (F, Hc?, Wc?, 3) in `out_format` with
    each frame's content at (0, 0)."""
    from ..render import simple as render_simple
    from ..render.stages import core as st
    from ..vardct.group import _BlockList
    from ..vardct.transform_map import covered_blocks_x, covered_blocks_y
    from ..vardct.transforms_batch import transform_to_pixels_batch

    f0 = frames[0]
    fh = f0.file_header
    Wc, Hc = fh.xsize, fh.ysize
    cbw, cbh = -(-Wc // 8), -(-Hc // 8)
    Hp, Wp = cbh * 8, cbw * 8
    F = len(frames)
    biases = np.asarray(
        fh.transform_data.opsin_inverse_matrix.quant_biases, dtype=np.float32
    )

    # ---- global (frame, group) block tables ------------------------------
    # The frame loop only stacks maps and per-frame scalars and collects
    # the per-group block tables (exported by the native HF-groups driver
    # when available); the per-block dequant/CfL parameters then compute
    # in ONE vectorized pass over the cross-frame concatenation.
    coeff_parts = []
    bx_parts, by_parts, fi_parts, off_parts, tid_parts = [], [], [], [], []
    pool0 = getattr(f0.hf_global, "coeff_pool", None)
    shared_pool = (
        pool0
        if pool0 is not None
        and all(getattr(fr.hf_global, "coeff_pool", None) is pool0 for fr in frames)
        else None
    )
    tcw, tch = -(-cbw // 8), -(-cbh // 8)
    # Fold fast path: when the whole-animation fold decoded these frames
    # and every frame is exactly canvas-sized, its (F, ...) output slabs
    # ARE the stacked maps — consume them directly instead of re-stacking
    # 2F per-frame views (the gathers below only read within each frame's
    # block extent, which the fold fully wrote).
    slabs0 = getattr(f0, "fold_slabs", None)
    use_slabs = (
        slabs0 is not None
        and all(getattr(fr, "fold_slabs", None) is slabs0 for fr in frames)
        and slabs0["dims"] == (cbw, cbh, tcw, tch)
    )
    if use_slabs:
        lf_all = slabs0["lf"]
        rq_all = slabs0["rq"]
        yx_all = slabs0["ytox"]
        yb_all = slabs0["ytob"]
    else:
        lf_all = np.zeros((3, F, cbh, cbw), np.float32)
        rq_all = np.ones((F, cbh, cbw), np.int32)
        yx_all = np.zeros((F, tch, tcw), np.int8)
        yb_all = np.zeros((F, tch, tcw), np.int8)
    igs_f = np.empty(F, np.float32)
    xdm_f = np.empty(F, np.float32)
    bdm_f = np.empty(F, np.float32)
    basex_f = np.empty(F, np.float32)
    baseb_f = np.empty(F, np.float32)
    cf_f = np.empty(F, np.float32)
    stride = GROUP_PX * GROUP_PX
    if use_slabs:
        # per-frame scalars straight from the fold's scal/dbl slabs —
        # same op order as the per-frame object walk they replace
        scal_s = slabs0["scal"]
        dbl_s = slabs0["dbl"]
        igs_f[:] = (65536.0 / scal_s[:, 0].astype(np.float64)).astype(np.float32)
        xdm_f[:] = ((1.0 / 1.25) ** (slabs0["xqm"] - 2.0)).astype(np.float32)
        bdm_f[:] = ((1.0 / 1.25) ** (slabs0["bqm"] - 2.0)).astype(np.float32)
        basex_f[:] = dbl_s[:, 3].astype(np.float32)
        baseb_f[:] = dbl_s[:, 4].astype(np.float32)
        cf_f[:] = scal_s[:, 10].astype(np.float32)
    gid = 0
    frame_iter = (
        () if use_slabs and shared_pool is not None else enumerate(frames)
    )
    for fi, fr in frame_iter:
        header = fr.header
        bw, bh = header.size_blocks()
        if bh > cbh or bw > cbw:
            from ..errors import NotSupported

            raise NotSupported("frame larger than canvas in batched path")
        if not use_slabs:
            lf_all[:, fi, :bh, :bw] = np.stack(fr.lf_image)[:, :bh, :bw]
            qp = fr.lf_global.quant_params
            ccp = fr.lf_global.color_correlation_params
            igs_f[fi] = qp.inv_global_scale
            xdm_f[fi] = (1.0 / 1.25) ** (header.x_qm_scale - 2.0)
            bdm_f[fi] = (1.0 / 1.25) ** (header.b_qm_scale - 2.0)
            basex_f[fi] = ccp.base_correlation_x
            baseb_f[fi] = ccp.base_correlation_b
            cf_f[fi] = ccp.color_factor
            hf = fr.hf_meta
            rq_all[fi, :bh, :bw] = hf["raw_quant"]
            th, tw = hf["ytox"].shape
            yx_all[fi, :th, :tw] = hf["ytox"]
            yb_all[fi, :th, :tw] = hf["ytob"]
        tables = getattr(fr.hf_global, "block_tables", None)
        slots = getattr(fr.hf_global, "coeff_pool_slots", None)
        for g in sorted(fr.hf_global.hf_coefficients):
            coeff_parts.append(fr.hf_global.hf_coefficients[g])
            if shared_pool is not None:
                base = np.int64(slots[g]) * (3 * stride)
            else:
                base = np.int64(gid) * stride
            if tables is not None and g in tables:
                t = tables[g]
                bx_parts.append(t[:, 0])
                by_parts.append(t[:, 1])
                tid_parts.append(t[:, 2])
                off_parts.append(t[:, 3].astype(np.int64) + base)
            else:
                bl = _BlockList(fr, g)
                (gx0, gy0) = bl.origin
                bx_parts.append(bl.bxs + gx0)
                by_parts.append(bl.bys + gy0)
                tid_parts.append(bl.tids)
                off_parts.append(bl.offs.astype(np.int64) + base)
            fi_parts.append(np.full(len(bx_parts[-1]), fi, np.int32))
            gid += 1
    if shared_pool is not None:
        # channel views over the one pool: coeffs for (slot, c) live at
        # slot*3*stride + c*stride + off (no cross-frame concatenation)
        flat = shared_pool.reshape(-1)
        coeffs = [flat, flat[stride:], flat[2 * stride :]]
    else:
        coeffs = np.concatenate(coeff_parts, axis=1) if coeff_parts else None

    if use_slabs and shared_pool is not None:
        # one masked flatten over the fold's (F, 1024, 4) block slab —
        # replaces the 48-frame python collection loop entirely (rows are
        # raster-ordered per frame, slot f's coeffs at f*3*stride)
        counts = np.asarray(slabs0["counts"], np.int64)
        blocks = slabs0["blocks"]
        sel = np.arange(blocks.shape[1])[None, :] < counts[:, None]
        rows = blocks[sel]
        g_fidx = np.repeat(np.arange(F, dtype=np.int32), counts)
        g_gbx = np.ascontiguousarray(rows[:, 0])
        g_gby = np.ascontiguousarray(rows[:, 1])
        all_tids = np.ascontiguousarray(rows[:, 2])
        g_off = rows[:, 3].astype(np.int64) + g_fidx.astype(np.int64) * (
            3 * stride
        )
    else:
        all_tids = np.concatenate(tid_parts) if tid_parts else np.zeros(0, np.int32)
        g_gbx = np.concatenate(bx_parts).astype(np.int32) if tid_parts else None
        g_gby = np.concatenate(by_parts).astype(np.int32) if tid_parts else None
        g_fidx = np.concatenate(fi_parts) if tid_parts else None
        g_off = np.concatenate(off_parts) if tid_parts else None
    if g_gbx is not None and len(g_gbx):
        # vectorized per-block dequant scales and CfL factors (same f32
        # op order as the per-group computation they replace)
        rq_b = rq_all[g_fidx, g_gby, g_gbx].astype(np.float32)
        sy = igs_f[g_fidx] / np.maximum(rq_b, 1e-9)
        g_scl = np.stack([sy * xdm_f[g_fidx], sy, sy * bdm_f[g_fidx]], axis=1)
        g_xcc = (
            basex_f[g_fidx]
            + yx_all[g_fidx, g_gby // 8, g_gbx // 8].astype(np.float32)
            / cf_f[g_fidx]
        )
        g_bcc = (
            baseb_f[g_fidx]
            + yb_all[g_fidx, g_gby // 8, g_gbx // 8].astype(np.float32)
            / cf_f[g_fidx]
        )
    else:
        g_scl = g_xcc = g_bcc = None

    # One stacked canvas for the whole pipeline: frames sit at 32-row-
    # aligned offsets within (3, F*Hs, Wp) channel planes, so the IDCT
    # scatters, the in-place strided filters, the single color pass and
    # the u8 dither all address the same memory with per-frame dither
    # phase identical to the per-frame path. No per-frame copies.
    Hs = -(-Hp // 32) * 32
    if use_slabs and Hs == Hp:
        # fold mode: every 8x8 block of every (canvas-sized) frame is
        # covered by a transform scatter and there are no padding rows,
        # so the canvas never needs zero-fill — reuse one arena slab
        # across decodes instead of faulting 9 MB of fresh zero pages
        from ..native import _anim_arena

        stacked = _anim_arena(("stacked", F, Hs, Wp), (3, F * Hs, Wp), np.float32)
    else:
        stacked = np.zeros((3, F * Hs, Wp), np.float32)
    from numpy.lib.stride_tricks import as_strided

    # (F, 3, Hp, Wp) and blocked views over the stacked storage
    planes = as_strided(
        stacked,
        shape=(F, 3, Hp, Wp),
        strides=(Hs * Wp * 4, F * Hs * Wp * 4, Wp * 4, 4),
    )
    pv = as_strided(
        stacked,
        shape=(F, 3, cbh, 8, cbw, 8),
        strides=(Hs * Wp * 4, F * Hs * Wp * 4, 8 * Wp * 4, Wp * 4, 8 * 4, 4),
    )
    for t in np.unique(all_tids).tolist():
        m = all_tids == t
        gbx = g_gbx[m]
        gby = g_gby[m]
        fidx = g_fidx[m]
        off = g_off[m]
        scl = g_scl[m]
        xcc = g_xcc[m]
        bcc = g_bcc[m]
        cx = covered_blocks_x(t)
        cy = covered_blocks_y(t)
        nc = cx * cy * BLOCK_SIZE
        mats = f0.hf_global.dequant_matrices.matrix3(t, nc)
        from .. import native
        from ..native import dequant_cfl_native

        coeffs_ok = (
            all(c.flags.c_contiguous for c in coeffs)
            if isinstance(coeffs, list)
            else coeffs.flags.c_contiguous
        )
        if t == 0 and native.available() and coeffs_ok:
            # fused native dequant+CfL+IDCT8+scatter straight into the
            # per-frame planes (fidx advances the plane pointers)
            from ..vardct.transforms import idct_matrix

            lf3 = np.ascontiguousarray(lf_all[:, fidx, gby, gbx])
            native.dct8_fused_native(
                [coeffs[0], coeffs[1], coeffs[2]],
                off,
                np.ascontiguousarray(scl),
                np.ascontiguousarray(xcc),
                np.ascontiguousarray(bcc),
                np.ascontiguousarray(mats, dtype=np.float32),
                biases,
                lf3,
                np.ascontiguousarray(idct_matrix(8), dtype=np.float32),
                [stacked[0], stacked[1], stacked[2]],
                np.ascontiguousarray(gbx, dtype=np.int32),
                np.ascontiguousarray(gby, dtype=np.int32),
                fidx=np.ascontiguousarray(fidx, dtype=np.int32),
                frame_stride=Hs * Wp,
            )
            continue
        dq = dequant_cfl_native(coeffs, off, nc, mats, scl, xcc, bcc, biases)
        if dq is None:
            idx = off[:, None] + np.arange(nc)[None, :]
            qb = np.stack([coeffs[c][idx] for c in range(3)], axis=1)
            q = qb.astype(np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                adj = np.where(qb == 0, 0.0, q - biases[3] / q)
            adj = np.where(np.abs(qb) < 2, q * biases[None, :3, None], adj).astype(
                np.float32
            )
            dq = adj * mats[None] * scl[:, :, None]
            dq[:, 0] += xcc[:, None] * dq[:, 1]
            dq[:, 2] += bcc[:, None] * dq[:, 1]
        for c in (1, 0, 2):
            if cx == 1 and cy == 1:
                tiles = lf_all[c, fidx, gby, gbx][:, None, None]
            else:
                # broadcast gather of the (cy, cx) LF tiles (a per-block
                # python loop here cost ~3 us x thousands of blocks)
                iy = np.arange(cy, dtype=np.intp)
                ix = np.arange(cx, dtype=np.intp)
                tiles = lf_all[
                    c,
                    fidx[:, None, None],
                    gby[:, None, None] + iy[None, :, None],
                    gbx[:, None, None] + ix[None, None, :],
                ]
            pix = transform_to_pixels_batch(np, t, tiles, dq[:, c])
            ph, pw = pix.shape[1], pix.shape[2]
            if ph == 8 and pw == 8:
                pv[fidx, c, gby, :, gbx, :] = pix
            else:
                # one flat-index scatter per (type, channel) into the
                # contiguous stacked canvas
                rows = (
                    fidx[:, None].astype(np.intp) * Hs
                    + gby[:, None] * 8
                    + np.arange(ph, dtype=np.intp)[None, :]
                )
                cols = gbx[:, None] * 8 + np.arange(pw, dtype=np.intp)[None, :]
                flat = rows[:, :, None] * Wp + cols[:, None, :]
                stacked[c].reshape(-1)[flat.reshape(-1)] = pix.reshape(-1)

    # ---- per-frame IN-PLACE filters on the stacked canvas ----------------
    # mirror semantics are per-frame (visible-edge), so each frame filters
    # at its own (h, w); the strided native chain writes back in place
    rf = f0.header.restoration_filter
    gab = None
    if rf.gab:
        gab = (
            float(rf.gab_x_weight1), float(rf.gab_x_weight2),
            float(rf.gab_y_weight1), float(rf.gab_y_weight2),
            float(rf.gab_b_weight1), float(rf.gab_b_weight2),
        )
    from .. import native
    from ..native import filter_chain_multi_native, filter_chain_native

    fsizes = []
    batch_idx, batch_offs, batch_hs, batch_ws = [], [], [], []
    sig_parts, sig_offs = [], []
    sig_pos = 0
    for fi, fr in enumerate(frames):
        w, h = fr.header.size_upsampled()
        w, h = min(w, Wp), min(h, Hp)
        fsizes.append((h, w))
        if rf.epf_iters <= 0 and gab is None:
            continue
        if native.available() and h >= 8 and w >= 8:
            # fold into ONE native multi-frame filter call below
            batch_idx.append(fi)
            batch_offs.append(fi * Hs * Wp)
            batch_hs.append(h)
            batch_ws.append(w)
            if rf.epf_iters > 0:
                sb = st.compute_sigma_image(fr)
                sbh, sbw = -(-h // 8), -(-w // 8)
                tight = np.ascontiguousarray(
                    sb[:sbh, :sbw], dtype=np.float32
                ).reshape(-1)
                sig_parts.append(tight)
                sig_offs.append(sig_pos)
                sig_pos += len(tight)
            continue
        views = [stacked[c, fi * Hs : fi * Hs + h, :w] for c in range(3)]
        sb = st.compute_sigma_image(fr) if rf.epf_iters > 0 else None
        out = filter_chain_native(
            views, sb, gab, rf.epf_iters, rf, sigma_is_block=True, in_place=True
        )
        if out is None:
            # numpy fallback (native lib missing or tiny frame)
            chans = [np.ascontiguousarray(v) for v in views]
            inv_sigma = (
                st._expand_sigma(np, sb, h, w, (0, 0))
                if rf.epf_iters > 0
                else None
            )
            if gab is not None:
                chans = [
                    st.gaborish(np, p, gab[2 * c], gab[2 * c + 1])
                    for c, p in enumerate(chans)
                ]
            if rf.epf_iters >= 3:
                chans = st.epf_step_px(np, chans, inv_sigma, rf, 0)
            if rf.epf_iters >= 1:
                chans = st.epf_step_px(np, chans, inv_sigma, rf, 1)
            if rf.epf_iters >= 2:
                chans = st.epf_step_px(np, chans, inv_sigma, rf, 2)
            for c in range(3):
                views[c][...] = chans[c]

    if batch_idx:
        filter_chain_multi_native(
            stacked, batch_offs, batch_hs, batch_ws, Wp,
            np.concatenate(sig_parts) if sig_parts else None,
            sig_offs if sig_parts else None,
            gab, rf.epf_iters, rf,
        )

    # ---- ONE color + output-convert pass over the whole stack ------------
    dtype = {"u8": np.uint8, "u16": np.uint16, "f16": np.float16}.get(
        out_format, np.float32
    )
    if out_format == "u8":
        u8img = render_simple.color_convert_u8_native(
            f0, [stacked[0], stacked[1], stacked[2]]
        )
        if u8img is not None:
            if Hs == Hp and all(s == (Hp, Wp) for s in fsizes):
                # every frame fills the canvas exactly: the stacked u8
                # image IS the (F, Hp, Wp, 3) result
                return u8img.reshape(F, Hp, Wp, 3)
            out = np.zeros((F, Hp, Wp, 3), dtype)
            for fi, (h, w) in enumerate(fsizes):
                out[fi, :h, :w] = u8img[fi * Hs : fi * Hs + h, :w]
            return out
    out = np.zeros((F, Hp, Wp, 3), dtype)
    schans = render_simple.color_transform(
        f0, [stacked[c] for c in range(3)], xp=np, in_place=True
    )
    if out_format != "f32":
        schans = [
            st.convert_output(np, p, out_format, channel=i)
            for i, p in enumerate(schans)
        ]
    for fi, (h, w) in enumerate(fsizes):
        out[fi, :h, :w] = np.stack(
            [schans[c][fi * Hs : fi * Hs + h, :w] for c in range(3)], axis=-1
        )
    return out
