"""Native host decoder: builds (g++, cached) and wraps modular_decode.cc.

The C++ path is semantics-identical to the Python oracle and is verified
against it (tests/test_native.py). It decodes whole modular sub-bitstreams
and VarDCT AC groups from raw section bytes at production speed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "modular_decode.cc"

_lib = None
_disabled = os.environ.get("JXL_TPU_NO_NATIVE", "") == "1"

import threading as _threading

_hist_scratch = _threading.local()


_SRC_FILTERS = _DIR / "filters.cc"
_SRC_COLORS = _DIR / "colors.cc"
_SRC_HOSTOPS = _DIR / "hostops.cc"


def _build() -> pathlib.Path | None:
    src = (
        _SRC.read_bytes()
        + _SRC_FILTERS.read_bytes()
        + _SRC_COLORS.read_bytes()
        + _SRC_HOSTOPS.read_bytes()
    )
    # the tag must key on flags too, or flag changes reuse a stale .so
    tag = hashlib.sha256(src + b"|ffp-contract-off-v1").hexdigest()[:16]
    out = _DIR / f"_modular_decode_{tag}.so"
    if out.exists():
        return out
    base = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC"]
    objs = []
    try:
        for s, extra in (
            # decode kernels must match numpy's separate mul+add bit-exactly
            # (GCC contracts a*b+c into fma by default at -O3)
            (_SRC, ["-ffp-contract=off"]),
            (_SRC_FILTERS, []),
            (_SRC_HOSTOPS, ["-ffp-contract=off"]),
            # colors.cc alone gets fast-math: it needs vectorized powf
            # (libmvec); the exact-semantics decode/filter kernels do not
            # tolerate reassociation
            (_SRC_COLORS, ["-ffast-math", "-fopenmp-simd"]),
        ):
            o = _DIR / f"_{s.stem}_{tag}.o"
            subprocess.run(
                base + extra + ["-c", str(s), "-o", str(o)],
                check=True, capture_output=True, timeout=120,
            )
            objs.append(o)
        subprocess.run(
            ["g++", "-shared", *map(str, objs), "-o", str(out)],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        return None
    finally:
        for o in objs:
            o.unlink(missing_ok=True)
    return out


def get_lib():
    global _lib
    if _disabled:
        return None
    if _lib is None:
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.jxl_decode_modular.restype = ctypes.c_int
        lib.jxl_read_unsigned_run.restype = ctypes.c_int
        lib.jxl_decode_vardct_ac.restype = ctypes.c_int
        lib.jxl_decode_hf_groups.restype = ctypes.c_int
        lib.jxl_decode_lf_group_vardct.restype = ctypes.c_int
        lib.jxl_decode_lf_global_tables.restype = ctypes.c_int
        lib.jxl_place_transforms.restype = ctypes.c_int
        lib.jxl_decode_histograms.restype = ctypes.c_int
        lib.jxl_decode_tree.restype = ctypes.c_int
        lib.jxl_read_permutations.restype = ctypes.c_int
        lib.jxl_gradient_reconstruct.restype = None
        lib.jxl_apply_lehmer.restype = ctypes.c_int
        lib.jxl_filter_chain.restype = None
        lib.jxl_filter_chain_strided.restype = None
        lib.jxl_dequant_cfl.restype = None
        lib.jxl_xyb_srgb_u8.restype = None
        lib.jxl_xyb_tf_f32.restype = None
        lib.jxl_noise_field.restype = None
        lib.jxl_noise_field_rows.restype = None
        lib.jxl_dct8_fused.restype = ctypes.c_int
        lib.jxl_dither_u8.restype = None
        lib.jxl_scatter_blocks.restype = None
        lib.jxl_spline_splat.restype = None
        lib.jxl_decode_icc.restype = ctypes.c_int
        lib.jxl_anim_decode_frames.restype = ctypes.c_int
        lib.jxl_rct.restype = None
        lib.jxl_interleave_f32.restype = None
        lib.jxl_interleave_u8.restype = None
        lib.jxl_interleave_u16.restype = None
        lib.jxl_i32_to_f32_scaled.restype = None
        lib.jxl_i32_scaled_interleave.restype = None
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(arr, typ):
    # c_void_p(addr) is ~2x cheaper than data_as(POINTER(typ)) and ctypes
    # passes either identically to untyped (no-argtypes) foreign calls.
    # Pin the array on the pointer object (like data_as does) so inline
    # temporaries stay alive for the duration of the foreign call.
    p = ctypes.c_void_p(arr.ctypes.data)
    p._arr = arr
    return p



def _databuf(br):
    """Zero-copy ctypes view of the reader's backing buffer (bytes pass
    through; bytearray wraps via from_buffer — copying the whole stream
    per native call made streaming decodes O(N * sections))."""
    d = br.data
    if isinstance(d, bytes):
        return d
    return (ctypes.c_char * len(d)).from_buffer(d)

def pack_entropy(histograms):
    """Pack a Histograms bundle into flat arrays for the native decoder.

    Memoized per Histograms object: modular decodes reuse one bundle for
    hundreds of substreams."""
    cached = getattr(histograms, "_native_packed", None)
    if cached is not None:
        return cached
    packed = _pack_entropy(histograms)
    try:
        histograms._native_packed = packed
    except AttributeError:  # foreign histogram-like object without the slot
        pass
    return packed


def _pack_entropy(histograms):
    from ..entropy.ans import NativeAnsCodes
    from ..entropy.huffman import NativeHuffmanCodes

    n_clusters = histograms.num_histograms
    use_prefix = histograms.use_prefix_code
    if isinstance(histograms.codes, NativeHuffmanCodes):
        ctx_map = np.array(histograms.context_map, dtype=np.uint8)
        cfgs = np.zeros((n_clusters, 3), dtype=np.int32)
        for c in range(n_clusters):
            u = histograms.uint_configs[c]
            cfgs[c] = (u.split_exponent, u.msb_in_token, u.lsb_in_token)
        if histograms.lz77_enabled:
            lz = histograms.lz77_length_uint
            lz_cfg = np.array(
                [lz.split_exponent, lz.msb_in_token, lz.lsb_in_token], np.int32
            )
        else:
            lz_cfg = np.zeros(3, dtype=np.int32)
        return {
            "use_prefix": 1,
            "ans_tables": np.zeros(1, dtype=np.int32),
            "table_size": 0,
            "log_bucket": 0,
            "huff_offsets": histograms.codes.offsets,
            "huff_bits": histograms.codes.bits,
            "huff_values": histograms.codes.values,
            "context_map": ctx_map,
            "uint_configs": cfgs,
            "lz77": int(histograms.lz77_enabled),
            "min_symbol": histograms.lz77_min_symbol,
            "min_length": histograms.lz77_min_length,
            "lz_cfg": lz_cfg,
            "lz_dist_cluster": histograms.lz_dist_cluster,
        }
    if isinstance(histograms.codes, NativeAnsCodes):
        # natively-decoded tables are already in the packed wire layout
        ctx_map = np.array(histograms.context_map, dtype=np.uint8)
        cfgs = np.zeros((n_clusters, 3), dtype=np.int32)
        for c in range(n_clusters):
            u = histograms.uint_configs[c]
            cfgs[c] = (u.split_exponent, u.msb_in_token, u.lsb_in_token)
        if histograms.lz77_enabled:
            lz = histograms.lz77_length_uint
            lz_cfg = np.array(
                [lz.split_exponent, lz.msb_in_token, lz.lsb_in_token], np.int32
            )
        else:
            lz_cfg = np.zeros(3, dtype=np.int32)
        return {
            "use_prefix": 0,
            "ans_tables": histograms.codes.tables,
            "table_size": histograms.codes.tables.shape[2],
            "log_bucket": histograms.codes.log_bucket_size,
            "huff_offsets": np.zeros(1, dtype=np.int32),
            "huff_bits": np.zeros(1, dtype=np.int32),
            "huff_values": np.zeros(1, dtype=np.int32),
            "context_map": ctx_map,
            "uint_configs": cfgs,
            "lz77": int(histograms.lz77_enabled),
            "min_symbol": histograms.lz77_min_symbol,
            "min_length": histograms.lz77_min_length,
            "lz_cfg": lz_cfg,
            "lz_dist_cluster": histograms.lz_dist_cluster,
        }
    if use_prefix:
        offsets = np.zeros(n_clusters, dtype=np.int32)
        bits_l, values_l = [], []
        pos = 0
        for c in range(n_clusters):
            t = histograms.codes.tables[c]
            offsets[c] = pos
            bits_l.extend(t.bits)
            values_l.extend(t.values)
            pos += len(t.bits)
        ans_tables = np.zeros(1, dtype=np.int32)
        huff = (
            offsets,
            np.array(bits_l, dtype=np.int32),
            np.array(values_l, dtype=np.int32),
        )
        table_size, log_bucket = 0, 0
    else:
        hs = histograms.codes.histograms
        table_size = len(hs[0].dist)
        log_bucket = hs[0].log_bucket_size
        ans_tables = np.zeros((n_clusters, 5, table_size), dtype=np.int32)
        for c, h in enumerate(hs):
            ans_tables[c, 0] = h.dist
            ans_tables[c, 1] = h.alias_symbol
            ans_tables[c, 2] = h.alias_offset
            ans_tables[c, 3] = h.alias_cutoff
            ans_tables[c, 4] = h.alias_dist
        huff = (
            np.zeros(1, dtype=np.int32),
            np.zeros(1, dtype=np.int32),
            np.zeros(1, dtype=np.int32),
        )
    ctx_map = np.array(histograms.context_map, dtype=np.uint8)
    cfgs = np.zeros((n_clusters, 3), dtype=np.int32)
    for c in range(n_clusters):
        u = histograms.uint_configs[c]
        cfgs[c] = (u.split_exponent, u.msb_in_token, u.lsb_in_token)
    if histograms.lz77_enabled:
        lz = histograms.lz77_length_uint
        lz_cfg = np.array([lz.split_exponent, lz.msb_in_token, lz.lsb_in_token], dtype=np.int32)
    else:
        lz_cfg = np.zeros(3, dtype=np.int32)
    return {
        "use_prefix": int(use_prefix),
        "ans_tables": np.ascontiguousarray(ans_tables),
        "table_size": table_size,
        "log_bucket": log_bucket,
        "huff_offsets": huff[0],
        "huff_bits": huff[1],
        "huff_values": huff[2],
        "context_map": ctx_map,
        "uint_configs": np.ascontiguousarray(cfgs),
        "lz77": int(histograms.lz77_enabled),
        "min_symbol": histograms.lz77_min_symbol,
        "min_length": histograms.lz77_min_length,
        "lz_cfg": lz_cfg,
        "lz_dist_cluster": histograms.lz_dist_cluster,
    }


def decode_histograms_native(br, num_contexts: int, allow_lz77: bool):
    """Decode a Histograms bundle natively. Returns the filled Histograms
    object, None when the native library is unavailable or the bundle uses
    prefix codes (caller falls back to the Python oracle); raises on
    bitstream errors."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidBitstream, InvalidPermutation, NativeDecodeError, OutOfBounds
    from ..entropy.ans import NativeAnsCodes
    from ..entropy.hybrid_uint import HybridUint
    from ..entropy.reader import Histograms

    max_clusters = min(num_contexts + 1, 256)
    meta = np.zeros(16, dtype=np.int32)
    lz_cfg = np.zeros(3, dtype=np.int32)
    # scratch the native decoder fully writes for the region we slice;
    # reused per thread (results are .copy()'d out below)
    scr = _hist_scratch.__dict__
    if scr.get("cap", -1) < num_contexts:
        scr["cap"] = max(num_contexts, 4096)
        scr["cmap"] = np.empty(scr["cap"] + 1, dtype=np.uint8)
        scr["cfgs"] = np.empty((256, 3), dtype=np.int32)
        scr["tables"] = np.empty((256, 5, 256), dtype=np.int32)
        scr["singles"] = np.empty(256, dtype=np.int32)
        scr["huff_off"] = np.empty(256, dtype=np.int32)
    cmap = scr["cmap"]
    cfgs = scr["cfgs"]
    tables = scr["tables"]
    singles = scr["singles"]
    huff_off = scr["huff_off"]
    if "huff_bits" not in scr:
        scr["huff_bits"] = np.empty(1 << 14, dtype=np.int32)
        scr["huff_vals"] = np.empty(1 << 14, dtype=np.int32)
    data = _databuf(br)
    while True:
        huff_bits = scr["huff_bits"]
        huff_vals = scr["huff_vals"]
        huff_cap = len(huff_bits)
        bit_pos = ctypes.c_uint64(br.pos)
        ret = lib.jxl_decode_histograms(
            data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
            ctypes.c_int(num_contexts), ctypes.c_int(1 if allow_lz77 else 0),
            _ptr(meta, ctypes.c_int32), _ptr(lz_cfg, ctypes.c_int32),
            _ptr(cmap, ctypes.c_uint8), _ptr(cfgs, ctypes.c_int32),
            _ptr(tables, ctypes.c_int32), _ptr(singles, ctypes.c_int32),
            _ptr(huff_off, ctypes.c_int32), _ptr(huff_bits, ctypes.c_int32),
            _ptr(huff_vals, ctypes.c_int32), ctypes.c_int64(huff_cap),
        )
        if ret != 9:
            break
        grown = max(huff_cap * 2, int(meta[11]))
        scr["huff_bits"] = np.empty(grown, dtype=np.int32)
        scr["huff_vals"] = np.empty(grown, dtype=np.int32)
    if ret == 8:
        return None  # needs the python oracle
    if ret == 2:
        raise OutOfBounds(1)
    if ret != 0:
        raise NativeDecodeError(f"native histogram decode failed (code {ret})")
    br.pos = bit_pos.value
    return _histograms_from_packed(
        meta, lz_cfg, cmap, cfgs, tables, singles,
        huff_off, huff_bits, huff_vals, num_contexts,
    )


def _histograms_from_packed(
    meta, lz_cfg, cmap, cfgs, tables, singles, huff_off, huff_bits, huff_vals,
    num_contexts,
):
    """Build a Histograms object (with its _native_packed dict attached)
    from the jxl_decode_histograms output-array convention. The arrays are
    shared per-thread scratch — everything kept is copied out."""
    from ..entropy.ans import NativeAnsCodes
    from ..entropy.hybrid_uint import HybridUint
    from ..entropy.reader import Histograms

    h = Histograms.__new__(Histograms)
    h.lz77_enabled = bool(meta[0])
    h.lz77_min_symbol = int(meta[1])
    h.lz77_min_length = int(meta[2])
    h.lz77_length_uint = (
        HybridUint(int(lz_cfg[0]), int(lz_cfg[1]), int(lz_cfg[2]))
        if h.lz77_enabled
        else None
    )
    n_ctx = num_contexts + (1 if h.lz77_enabled else 0)
    h.context_map = cmap[:n_ctx].tolist()
    h.lz_dist_cluster = h.context_map[-1] if h.lz77_enabled else 0
    h.use_prefix_code = bool(meta[10])
    h.log_alpha_size = int(meta[6])
    num_clusters = int(meta[7])
    table_size = int(meta[8])
    h.uint_configs = [
        HybridUint(int(cfgs[c, 0]), int(cfgs[c, 1]), int(cfgs[c, 2]))
        for c in range(num_clusters)
    ]
    # copies, not views: cmap/cfgs are shared per-thread scratch
    cfgs_arr = cfgs[:num_clusters].copy()
    lz_cfg_arr = lz_cfg.copy() if h.lz77_enabled else np.zeros(3, dtype=np.int32)
    ctx_arr = cmap[:n_ctx].copy()
    if h.use_prefix_code:
        from ..entropy.huffman import NativeHuffmanCodes

        n = int(meta[11])
        h.codes = NativeHuffmanCodes(
            huff_off[:num_clusters].copy(), huff_bits[:n].copy(),
            huff_vals[:n].copy(), singles[:num_clusters].copy(),
        )
        h._native_packed = {
            "use_prefix": 1,
            "ans_tables": np.zeros(1, dtype=np.int32),
            "table_size": 0,
            "log_bucket": 0,
            "huff_offsets": h.codes.offsets,
            "huff_bits": h.codes.bits,
            "huff_values": h.codes.values,
            "context_map": ctx_arr,
            "uint_configs": cfgs_arr,
            "lz77": int(h.lz77_enabled),
            "min_symbol": h.lz77_min_symbol,
            "min_length": h.lz77_min_length,
            "lz_cfg": lz_cfg_arr,
            "lz_dist_cluster": h.lz_dist_cluster,
        }
    else:
        # the native decoder packs clusters contiguously at stride table_size
        packed = (
            tables.reshape(-1)[: num_clusters * 5 * table_size]
            .reshape(num_clusters, 5, table_size)
            .copy()
        )
        h.codes = NativeAnsCodes(
            packed, singles[:num_clusters].copy(), int(meta[9])
        )
        h._native_packed = {
            "use_prefix": 0,
            "ans_tables": packed,
            "table_size": table_size,
            "log_bucket": int(meta[9]),
            "huff_offsets": np.zeros(1, dtype=np.int32),
            "huff_bits": np.zeros(1, dtype=np.int32),
            "huff_values": np.zeros(1, dtype=np.int32),
            "context_map": ctx_arr,
            "uint_configs": cfgs_arr,
            "lz77": int(h.lz77_enabled),
            "min_symbol": h.lz77_min_symbol,
            "min_length": h.lz77_min_length,
            "lz_cfg": lz_cfg_arr,
            "lz_dist_cluster": h.lz_dist_cluster,
        }
    return h


def pack_tree(tree) -> np.ndarray:
    nodes = np.zeros((len(tree.nodes), 8), dtype=np.int32)
    for i, n in enumerate(tree.nodes):
        if n.is_leaf:
            nodes[i] = (-1, 0, 0, 0, int(n.predictor), n.offset, n.multiplier, n.context)
        else:
            nodes[i] = (n.property, n.splitval, n.left, n.right, 0, 0, 1, 0)
    return nodes


def _entropy_args(ent, dist_multiplier: int = 0):
    """The shared ctypes argument tail for packed entropy tables
    (memoized on the packed dict for the common dist_multiplier=0)."""
    if dist_multiplier == 0:
        cached = ent.get("_eargs0")
        if cached is None:
            cached = _entropy_args_build(ent, 0)
            ent["_eargs0"] = cached
        return cached
    return _entropy_args_build(ent, dist_multiplier)


def _entropy_args_build(ent, dist_multiplier: int):
    return (
        ctypes.c_int(ent["use_prefix"]),
        _ptr(ent["ans_tables"], ctypes.c_int32), ctypes.c_int(ent["table_size"]),
        ctypes.c_int(ent["log_bucket"]),
        _ptr(ent["huff_offsets"], ctypes.c_int32),
        _ptr(ent["huff_bits"], ctypes.c_int32),
        _ptr(ent["huff_values"], ctypes.c_int32),
        _ptr(ent["context_map"], ctypes.c_uint8),
        ctypes.c_int(len(ent["context_map"])),
        _ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), _ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]), ctypes.c_uint32(dist_multiplier),
    )


def decode_tree_native(histograms, br, size_limit: int):
    """MA-tree node loop natively. Returns (nodes_arr (N,8) int32,
    max_property) or None when unavailable; raises on bitstream errors."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidBitstream, InvalidPermutation, NativeDecodeError, OutOfBounds

    ent = pack_entropy(histograms)
    data = _databuf(br)
    cap = 1 << 12
    # (tree nodes scratch below is sliced to the decoded count)
    while True:
        nodes = np.empty((cap, 8), dtype=np.int32)
        count = ctypes.c_int64(0)
        max_prop = ctypes.c_int32(0)
        bit_pos = ctypes.c_uint64(br.pos)
        ret = lib.jxl_decode_tree(
            data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
            *_entropy_args(ent),
            ctypes.c_int64(size_limit), ctypes.c_int64(cap),
            _ptr(nodes, ctypes.c_int32), ctypes.byref(count),
            ctypes.byref(max_prop),
        )
        if ret != 9:
            break
        cap *= 4
    if ret == 2:
        raise OutOfBounds(1)
    if ret != 0:
        raise NativeDecodeError(f"native tree decode failed (code {ret})")
    br.pos = bit_pos.value
    return nodes[: count.value], int(max_prop.value)


def read_permutations_native(histograms, br, sizes, skips, check_final: bool):
    """Decode a sequence of Lehmer permutation codes sharing one decoder
    state. Returns (ends list, lehmer value arrays list) or None."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidBitstream, InvalidPermutation, NativeDecodeError, OutOfBounds

    ent = pack_entropy(histograms)
    data = _databuf(br)
    sz = np.asarray(sizes, dtype=np.uint32)
    sk = np.asarray(skips, dtype=np.uint32)
    cap = max(int(sz.sum()), 1)
    lehmer = np.zeros(cap, dtype=np.uint32)
    ends = np.zeros(len(sizes), dtype=np.int64)
    bit_pos = ctypes.c_uint64(br.pos)
    ret = lib.jxl_read_permutations(
        data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
        *_entropy_args(ent),
        ctypes.c_int(len(sizes)), _ptr(sz, ctypes.c_uint32),
        _ptr(sk, ctypes.c_uint32), _ptr(lehmer, ctypes.c_uint32),
        ctypes.c_int64(cap), _ptr(ends, ctypes.c_int64),
        ctypes.c_int(1 if check_final else 0),
    )
    if ret == 2:
        raise OutOfBounds(1)
    if ret == 3:
        raise InvalidPermutation("invalid permutation size")
    if ret != 0:
        raise NativeDecodeError(f"native permutation decode failed (code {ret})")
    br.pos = bit_pos.value
    out = []
    pos = 0
    for e in ends.tolist():
        out.append(lehmer[pos : pos + e])
        pos += e
    return out


def read_unsigned_run(histograms, br, ctx: int, count: int,
                      check_final: bool = False, dist_multiplier: int = 0):
    """Decode `count` clustered unsigned values at a fixed context natively
    (e.g. the entropy-coded context map). Returns a uint32 array or None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidBitstream, InvalidPermutation, NativeDecodeError

    ent = pack_entropy(histograms)
    out = np.zeros(max(count, 1), dtype=np.uint32)
    data = _databuf(br)
    bit_pos = ctypes.c_uint64(br.pos)
    ret = lib.jxl_read_unsigned_run(
        data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
        ctypes.c_int(ent["use_prefix"]),
        _ptr(ent["ans_tables"], ctypes.c_int32), ctypes.c_int(ent["table_size"]),
        ctypes.c_int(ent["log_bucket"]),
        _ptr(ent["huff_offsets"], ctypes.c_int32),
        _ptr(ent["huff_bits"], ctypes.c_int32),
        _ptr(ent["huff_values"], ctypes.c_int32),
        _ptr(ent["context_map"], ctypes.c_uint8), ctypes.c_int(len(ent["context_map"])),
        _ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), _ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]), ctypes.c_uint32(dist_multiplier),
        ctypes.c_int(ctx), ctypes.c_int(count), _ptr(out, ctypes.c_uint32),
        ctypes.c_int(1 if check_final else 0),
    )
    if ret != 0:
        raise NativeDecodeError(f"native unsigned-run decode failed (code {ret})")
    br.pos = bit_pos.value
    return out


def decode_modular_native(
    buffers, stream_id, header, tree, br, image_width, partial_out=None,
    residuals=False,
) -> bool:
    """Decode all channels of a modular sub-bitstream natively.

    Returns True on success (br.pos advanced, buffers filled); raises on
    bitstream errors. Falls back (returns False) if unavailable.

    With residuals=True (caller must have checked tree.is_gradient_only),
    buffers receive the raw signed residuals instead of reconstructed
    pixels — the device wavefront reconstruction consumes these.

    With `partial_out` (a 1-element list), bitstream errors still raise but
    partial_out[0] receives the number of channels decoded with a safety
    margin before the failure, and those channels' data is kept (ref
    decode/bitstream.rs last_safe_buf partial-decode semantics).
    """
    lib = get_lib()
    if lib is None:
        return False
    from ..errors import InvalidBitstream, InvalidPermutation, NativeDecodeError

    ent = pack_entropy(tree.histograms)
    tree_arr = getattr(tree, "_native_packed", None)
    if tree_arr is None:
        tree_arr = pack_tree(tree)
        try:
            tree._native_packed = tree_arr
        except AttributeError:
            pass
    wp = header.wp_header
    wp_params = getattr(wp, "_native_params", None)
    if wp_params is None:
        wp_params = np.array(
            [wp.p1c, wp.p2c, wp.p3ca, wp.p3cb, wp.p3cc, wp.p3cd, wp.p3ce,
             wp.w0, wp.w1, wp.w2, wp.w3, 0],
            dtype=np.int32,
        )
        try:
            wp._native_params = wp_params
        except AttributeError:
            pass

    # Channels decode straight into the caller's planes (flag bit 2:
    # ChannelDesc.offset carries the absolute base address) when every
    # buffer is a C-contiguous int32 plane; otherwise fall back to the
    # packed scratch + copy-out layout.
    direct = all(
        b.data.dtype == np.int32 and b.data.flags.c_contiguous for b in buffers
    )
    chan_info = np.empty((max(len(buffers), 1), 6), dtype=np.int64)
    if direct:
        out = np.empty(1, dtype=np.int32)
        for i, b in enumerate(buffers):
            h, w = b.data.shape
            shift = b.shift if b.shift is not None else (-1, -1)
            chan_info[i] = (w, h, shift[0], shift[1], w, b.data.ctypes.data)
    else:
        total = sum(b.data.shape[0] * b.data.shape[1] for b in buffers)
        # every live channel element is written by the decode loops
        out = np.empty(max(total, 1), dtype=np.int32)
        off = 0
        for i, b in enumerate(buffers):
            h, w = b.data.shape
            shift = b.shift if b.shift is not None else (-1, -1)
            chan_info[i] = (w, h, shift[0], shift[1], w, off)
            off += h * w

    data = _databuf(br)
    bit_pos = ctypes.c_uint64(br.pos)
    num_decoded = ctypes.c_int64(0)
    # the per-histograms / per-tree ctypes argument tuples are constant
    # across the hundreds of substreams sharing one bundle — memoize them
    # (animations spend real time in this marshaling otherwise)
    margs = ent.get("_modular_args")
    if margs is None:
        margs = (
            ctypes.c_int(ent["use_prefix"]),
            _ptr(ent["ans_tables"], ctypes.c_int32), ctypes.c_int(ent["table_size"]),
            ctypes.c_int(ent["log_bucket"]),
            _ptr(ent["huff_offsets"], ctypes.c_int32),
            _ptr(ent["huff_bits"], ctypes.c_int32),
            _ptr(ent["huff_values"], ctypes.c_int32),
            _ptr(ent["context_map"], ctypes.c_uint8), ctypes.c_int(len(ent["context_map"])),
            _ptr(ent["uint_configs"], ctypes.c_int32),
            ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
            ctypes.c_uint32(ent["min_length"]), _ptr(ent["lz_cfg"], ctypes.c_int32),
            ctypes.c_int(ent["lz_dist_cluster"]),
        )
        ent["_modular_args"] = margs
    ret = lib.jxl_decode_modular(
        data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
        *margs,
        ctypes.c_uint32(image_width if ent["lz77"] else 0),
        _ptr(tree_arr, ctypes.c_int32), ctypes.c_int(len(tree_arr)),
        ctypes.c_int(tree.num_properties),
        _ptr(wp_params, ctypes.c_int32),
        ctypes.c_int(len(buffers)), _ptr(chan_info, ctypes.c_int64),
        _ptr(out, ctypes.c_int32), ctypes.c_int(stream_id),
        ctypes.byref(num_decoded),
        ctypes.c_int(
            (1 if residuals else 0)
            | (2 if os.environ.get("JXL_TPU_NO_GRAD_SPEC") else 0)
            | (4 if direct else 0)
        ),
    )
    if ret != 0:
        if partial_out is not None:
            partial_out[0] = int(num_decoded.value)
            if not direct:
                off = 0
                for i, b in enumerate(buffers):
                    h, w = b.data.shape
                    if i < num_decoded.value:
                        b.data[...] = out[off : off + h * w].reshape(h, w)
                    off += h * w
        raise NativeDecodeError(f"native modular decode failed (code {ret})")
    br.pos = bit_pos.value
    if not direct:
        off = 0
        for b in buffers:
            h, w = b.data.shape
            b.data[...] = out[off : off + h * w].reshape(h, w)
            off += h * w
    return True


_NAT_ORDERS = None


def _natural_orders_concat():
    """Process-cached concatenation of the 13 natural zig-zag orders
    (int32) + the 14-entry prefix-offset table for the native HfGlobal
    fast path."""
    global _NAT_ORDERS
    if _NAT_ORDERS is None:
        from ..vardct.coeff_order import TRANSFORM_TYPE_LUT, natural_order_array

        parts = [natural_order_array(t) for t in TRANSFORM_TYPE_LUT]
        off = np.zeros(14, dtype=np.int32)
        for i, p in enumerate(parts):
            off[i + 1] = off[i] + len(p)
        _NAT_ORDERS = (
            np.ascontiguousarray(np.concatenate(parts)).astype(np.int32),
            off,
        )
    return _NAT_ORDERS


_hf_global_scratch = _threading.local()


def decode_hf_global_native(br, num_histo_bits: int, num_ac_contexts: int):
    """Single-pass HfGlobal with all-default dequant matrices in one
    native call (ref frame/decode.rs:513-583): default bit,
    num_histograms, pass-0 order selector, coded coefficient orders
    (permutations + Lehmer against the cached natural orders), AC
    histograms. Returns (num_histograms, used_orders, coded-orders dict,
    Histograms) or None when the library is unavailable or the stream
    carries custom matrices (bit position untouched -- the Python oracle
    re-reads); raises typed errors on bad streams."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidPermutation, NativeDecodeError, OutOfBounds

    nat, nat_off = _natural_orders_concat()
    scr = _hf_global_scratch.__dict__
    max_ctx = (1 << num_histo_bits) * num_ac_contexts + 8
    if scr.get("cap", -1) < max_ctx:
        scr["cap"] = max(max_ctx, 4096)
        scr["cmap"] = np.empty(scr["cap"] + 1, dtype=np.uint8)
    if "orders" not in scr:
        scr["orders"] = np.empty(3 * len(nat), dtype=np.int32)
        scr["cfgs"] = np.empty((256, 3), dtype=np.int32)
        scr["tables"] = np.empty((256, 5, 256), dtype=np.int32)
        scr["singles"] = np.empty(256, dtype=np.int32)
        scr["huff_off"] = np.empty(256, dtype=np.int32)
        scr["huff_bits"] = np.empty(1 << 14, dtype=np.int32)
        scr["huff_vals"] = np.empty(1 << 14, dtype=np.int32)
    info = np.zeros(2, dtype=np.int32)
    meta = np.zeros(16, dtype=np.int32)
    lz_cfg = np.zeros(3, dtype=np.int32)
    orders = scr["orders"]
    cmap = scr["cmap"]
    cfgs = scr["cfgs"]
    tables = scr["tables"]
    singles = scr["singles"]
    huff_off = scr["huff_off"]
    data = _databuf(br)
    while True:
        huff_bits = scr["huff_bits"]
        huff_vals = scr["huff_vals"]
        bit_pos = ctypes.c_uint64(br.pos)
        ret = lib.jxl_decode_hf_global(
            data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
            ctypes.c_int(num_histo_bits), ctypes.c_int(num_ac_contexts),
            _ptr(nat, ctypes.c_int32), _ptr(nat_off, ctypes.c_int32),
            _ptr(info, ctypes.c_int32), _ptr(orders, ctypes.c_int32),
            _ptr(meta, ctypes.c_int32), _ptr(lz_cfg, ctypes.c_int32),
            _ptr(cmap, ctypes.c_uint8), _ptr(cfgs, ctypes.c_int32),
            _ptr(tables, ctypes.c_int32), _ptr(singles, ctypes.c_int32),
            _ptr(huff_off, ctypes.c_int32), _ptr(huff_bits, ctypes.c_int32),
            _ptr(huff_vals, ctypes.c_int32), ctypes.c_int64(len(huff_bits)),
        )
        if ret != 9:
            break
        grown = max(len(huff_bits) * 2, int(meta[11]))
        scr["huff_bits"] = np.empty(grown, dtype=np.int32)
        scr["huff_vals"] = np.empty(grown, dtype=np.int32)
    if ret == 100 or ret == 8:
        return None  # custom matrices / prefix path: python oracle
    if ret == 2:
        raise OutOfBounds(1)
    if ret == 3:
        raise InvalidPermutation("invalid permutation size")
    if ret != 0:
        raise NativeDecodeError(f"native HfGlobal decode failed (code {ret})")
    br.pos = bit_pos.value
    num_histograms = int(info[0])
    used_orders = int(info[1])
    coded = {}
    pos = 0
    for o in range(13):
        if not (used_orders >> o) & 1:
            continue
        size = int(nat_off[o + 1] - nat_off[o])
        for c in range(3):
            coded[3 * o + c] = orders[pos : pos + size].copy()
            pos += size
    histograms = _histograms_from_packed(
        meta, lz_cfg, cmap, cfgs, tables, singles,
        huff_off, scr["huff_bits"], scr["huff_vals"],
        num_histograms * num_ac_contexts,
    )
    return num_histograms, used_orders, coded, histograms


def decode_lf_global_tables_native(br, is_vardct: bool, tree_size_limit: int):
    """LfGlobal table sequence in one native call (ref frame/decode.rs:
    314-434): LF quant factors, [VarDCT: quantizer params + block context
    map + CfL params], optional global MA tree incl. leaf histograms.

    Returns a dict of constructed objects (lf_quant tuple, quant params,
    block ctx map fields, cfl fields, tree) or None when unavailable;
    raises typed errors on invalid streams."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import (
        BaseColorCorrelationOutOfRange,
        FloatNaNOrInf,
        InvalidContextMap,
        LfQuantFactorTooSmall,
        NativeDecodeError,
        OutOfBounds,
        TooManyBlockContexts,
        TreeTooLarge,
    )

    scr = _hist_scratch.__dict__
    if scr.get("cap", -1) < 4096:
        scr["cap"] = 4096
        scr["cmap"] = np.empty(scr["cap"] + 1, dtype=np.uint8)
        scr["cfgs"] = np.empty((256, 3), dtype=np.int32)
        scr["tables"] = np.empty((256, 5, 256), dtype=np.int32)
        scr["singles"] = np.empty(256, dtype=np.int32)
        scr["huff_off"] = np.empty(256, dtype=np.int32)
    if "huff_bits" not in scr:
        scr["huff_bits"] = np.empty(1 << 14, dtype=np.int32)
        scr["huff_vals"] = np.empty(1 << 14, dtype=np.int32)
    if "lfg_scal" not in scr:
        scr["lfg_scal"] = np.empty(24, dtype=np.int32)
        scr["lfg_dbl"] = np.empty(8, dtype=np.float64)
        scr["lfg_lfthr"] = np.empty(48, dtype=np.int32)
        scr["lfg_qfthr"] = np.empty(16, dtype=np.int32)
        scr["lfg_bctx"] = np.empty(2600, dtype=np.uint8)
        scr["lfg_tree"] = np.empty((1 << 12, 8), dtype=np.int32)
    meta = np.zeros(16, dtype=np.int32)
    lz_cfg = np.zeros(3, dtype=np.int32)
    scal = scr["lfg_scal"]
    dbl = scr["lfg_dbl"]
    scal[:] = 0
    data = _databuf(br)
    while True:
        huff_bits = scr["huff_bits"]
        huff_vals = scr["huff_vals"]
        tree_nodes = scr["lfg_tree"]
        bit_pos = ctypes.c_uint64(br.pos)
        ret = lib.jxl_decode_lf_global_tables(
            data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
            ctypes.c_int(1 if is_vardct else 0),
            ctypes.c_int64(tree_size_limit), ctypes.c_int64(len(tree_nodes)),
            _ptr(scal, ctypes.c_int32), _ptr(dbl, ctypes.c_double),
            _ptr(scr["lfg_lfthr"], ctypes.c_int32),
            _ptr(scr["lfg_qfthr"], ctypes.c_int32),
            _ptr(scr["lfg_bctx"], ctypes.c_uint8),
            _ptr(tree_nodes, ctypes.c_int32),
            _ptr(meta, ctypes.c_int32), _ptr(lz_cfg, ctypes.c_int32),
            _ptr(scr["cmap"], ctypes.c_uint8), _ptr(scr["cfgs"], ctypes.c_int32),
            _ptr(scr["tables"], ctypes.c_int32), _ptr(scr["singles"], ctypes.c_int32),
            _ptr(scr["huff_off"], ctypes.c_int32),
            _ptr(huff_bits, ctypes.c_int32), _ptr(huff_vals, ctypes.c_int32),
            ctypes.c_int64(len(huff_bits)),
        )
        if ret == 9:
            grown = max(len(huff_bits) * 2, int(meta[11]))
            scr["huff_bits"] = np.empty(grown, dtype=np.int32)
            scr["huff_vals"] = np.empty(grown, dtype=np.int32)
            continue
        if ret == 11:
            scr["lfg_tree"] = np.empty((len(tree_nodes) * 4, 8), dtype=np.int32)
            continue
        break
    if ret == 2:
        raise OutOfBounds(1)
    if ret == 20:
        raise LfQuantFactorTooSmall("LF quant factor too small")
    if ret == 21:
        raise InvalidContextMap("invalid block context map")
    if ret == 22:
        raise TooManyBlockContexts("too many block contexts")
    if ret == 23:
        raise BaseColorCorrelationOutOfRange("base color correlation out of range")
    if ret == 24:
        raise FloatNaNOrInf("f16 header field is NaN or Inf")
    if ret == 25:
        raise NativeDecodeError("invalid MA tree value")
    if ret != 0:
        raise NativeDecodeError(f"native lf-global decode failed (code {ret})")

    out = {
        "lf_quant": (float(dbl[0]), float(dbl[1]), float(dbl[2])),
        "tree": None,
    }
    if is_vardct:
        out["quant_params"] = (int(scal[0]), int(scal[1]))
        if scal[2]:
            out["bctx_default"] = True
        else:
            out["bctx_default"] = False
            thr = scr["lfg_lfthr"]
            n0, n1, n2 = int(scal[5]), int(scal[6]), int(scal[7])
            out["lf_thresholds"] = [
                thr[:n0].tolist(),
                thr[n0 : n0 + n1].tolist(),
                thr[n0 + n1 : n0 + n1 + n2].tolist(),
            ]
            out["qf_thresholds"] = scr["lfg_qfthr"][: int(scal[4])].tolist()
            out["bctx_map"] = scr["lfg_bctx"][: int(scal[8])].tolist()
            out["num_lf_contexts"] = int(scal[3])
            out["bctx_num_contexts"] = int(scal[9])
        out["cfl"] = (
            int(scal[10]), float(dbl[3]), float(dbl[4]),
            int(scal[11]), int(scal[12]),
        )
    if scal[13]:
        from ..modular.tree import Tree

        count = int(scal[14])
        arr = np.ascontiguousarray(scr["lfg_tree"][:count])
        t = Tree.__new__(Tree)
        t._arr = arr
        t._nodes = None
        t._native_packed = arr
        t.num_properties = int(scal[15]) + 1
        t._validate_arr(arr)
        t.histograms = _histograms_from_packed(
            meta, lz_cfg, scr["cmap"], scr["cfgs"], scr["tables"],
            scr["singles"], scr["huff_off"], scr["huff_bits"],
            scr["huff_vals"], (count + 1) // 2,
        )
        out["tree"] = t
    br.pos = bit_pos.value
    return out


def decode_lf_group_vardct_native(
    br, tree, group, num_lf_groups, ox, oy, w, h, bw, hshift3, vshift3,
    is444, lf_factors3, ytox_lf, ytob_lf, num_lf_contexts, lf_thr, n_lf_thr,
    lf_planes, qlfmap, ytox_map, ytob_map, tmap, rqmap, epf_map, cbx, cby,
    invalid_transform,
):
    """VarDCT LF-group decode in one native call: LF modular substream +
    dequant + CfL at LF + quant-lf bucketing + HF metadata substream +
    transform placement (ref frame/modular/mod.rs:939-1089).

    Returns True on success (br.pos advanced, planes/maps written),
    False when the stream needs the Python path (local tree / local
    transforms) or the library is unavailable; raises typed errors on
    invalid streams."""
    lib = get_lib()
    if lib is None:
        return False
    from ..errors import InvalidBitstream, InvalidEpfValue, NativeDecodeError

    ent = pack_entropy(tree.histograms)
    tree_arr = getattr(tree, "_native_packed", None)
    if tree_arr is None:
        tree_arr = pack_tree(tree)
        try:
            tree._native_packed = tree_arr
        except AttributeError:
            pass
    data = _databuf(br)
    bit_pos = ctypes.c_uint64(br.pos)
    ret = lib.jxl_decode_lf_group_vardct(
        data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
        ctypes.c_int(ent["use_prefix"]),
        _ptr(ent["ans_tables"], ctypes.c_int32), ctypes.c_int(ent["table_size"]),
        ctypes.c_int(ent["log_bucket"]),
        _ptr(ent["huff_offsets"], ctypes.c_int32),
        _ptr(ent["huff_bits"], ctypes.c_int32),
        _ptr(ent["huff_values"], ctypes.c_int32),
        _ptr(ent["context_map"], ctypes.c_uint8),
        ctypes.c_int(len(ent["context_map"])),
        _ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), _ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]),
        _ptr(tree_arr, ctypes.c_int32), ctypes.c_int(len(tree_arr)),
        ctypes.c_int(tree.num_properties),
        ctypes.c_int(group), ctypes.c_int(num_lf_groups),
        ctypes.c_int(ox), ctypes.c_int(oy), ctypes.c_int(w), ctypes.c_int(h),
        ctypes.c_int(bw),
        _ptr(hshift3, ctypes.c_int32), _ptr(vshift3, ctypes.c_int32),
        ctypes.c_int(is444),
        _ptr(lf_factors3, ctypes.c_double),
        ctypes.c_float(ytox_lf), ctypes.c_float(ytob_lf),
        ctypes.c_int(num_lf_contexts),
        _ptr(lf_thr, ctypes.c_int32), _ptr(n_lf_thr, ctypes.c_int32),
        lf_planes[0].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lf_planes[1].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lf_planes[2].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        qlfmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ytox_map.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ytob_map.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int64(ytox_map.shape[1]),
        tmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rqmap.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        epf_map.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(cbx, ctypes.c_int32), _ptr(cby, ctypes.c_int32),
        ctypes.c_int(invalid_transform),
    )
    if ret == 8:
        return False  # local tree/transforms: Python path
    if ret == 10:
        raise InvalidEpfValue("invalid EPF value")
    if ret in (4, 5, 6, 7):
        from ..vardct.lf import _PLACE_ERRORS

        raise InvalidBitstream(_PLACE_ERRORS.get(ret, f"placement failed ({ret})"))
    if ret != 0:
        raise NativeDecodeError(f"native lf-group decode failed (code {ret})")
    br.pos = bit_pos.value
    return True


def decode_hf_groups_native(
    readers, group_ids, slots, bw, bh, gxc, gdim_blocks, hshift3, vshift3,
    tmap, rqmap, qlfmap, bctx_cmap, num_bctx, num_lf_contexts, qf_thr,
    num_ac_contexts, num_histograms, cbx, cby, shape_lut, ent, orders,
    order_off, shift, coeff_pool, chan_stride, blocks_out=None,
    blk_counts=None,
):
    """Whole-frame single-pass VarDCT AC decode: one native call loops the
    HF group sections (histogram selector, per-block item build from the
    transform/raw-quant/quant-lf maps, shared AC loop, final-state check).
    With blocks_out/blk_counts ((n, gdim^2, 4) int32 and (n,) int32), the
    per-group block tables [gbx, gby, tid, coeff_off] are exported for the
    render passes.

    Returns the list of final bit positions per reader, None when the
    library is unavailable; raises typed errors on bad streams."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import (
        InvalidBitstream,
        InvalidHistogramIndex,
        InvalidNumNonZeros,
        NativeDecodeError,
    )

    n = len(readers)
    ptrs = (ctypes.c_void_p * n)()
    sizes = (ctypes.c_uint64 * n)()
    poss = (ctypes.c_uint64 * n)()
    keep = []
    for i, br in enumerate(readers):
        buf = _databuf(br)
        keep.append(buf)
        if isinstance(buf, bytes):
            ptrs[i] = ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p)
        else:
            ptrs[i] = ctypes.cast(buf, ctypes.c_void_p)
        sizes[i] = len(buf)
        poss[i] = br.pos
    gids = np.ascontiguousarray(group_ids, dtype=np.int32)
    slots_arr = np.ascontiguousarray(slots, dtype=np.int32)
    ret = lib.jxl_decode_hf_groups(
        ptrs, sizes, poss, ctypes.c_int(n), _ptr(gids, ctypes.c_int32),
        ctypes.c_int(bw), ctypes.c_int(bh), ctypes.c_int(gxc),
        ctypes.c_int(gdim_blocks),
        _ptr(hshift3, ctypes.c_int32), _ptr(vshift3, ctypes.c_int32),
        _ptr(tmap, ctypes.c_uint8), _ptr(rqmap, ctypes.c_int32),
        _ptr(qlfmap, ctypes.c_uint8),
        _ptr(bctx_cmap, ctypes.c_uint8), ctypes.c_int(num_bctx),
        ctypes.c_int(num_lf_contexts),
        _ptr(qf_thr, ctypes.c_int32), ctypes.c_int(len(qf_thr)),
        ctypes.c_int(num_ac_contexts), ctypes.c_int(num_histograms),
        _ptr(cbx, ctypes.c_int32), _ptr(cby, ctypes.c_int32),
        _ptr(shape_lut, ctypes.c_int32),
        ctypes.c_int(ent["use_prefix"]),
        _ptr(ent["ans_tables"], ctypes.c_int32), ctypes.c_int(ent["table_size"]),
        ctypes.c_int(ent["log_bucket"]),
        _ptr(ent["huff_offsets"], ctypes.c_int32),
        _ptr(ent["huff_bits"], ctypes.c_int32),
        _ptr(ent["huff_values"], ctypes.c_int32),
        _ptr(ent["context_map"], ctypes.c_uint8),
        ctypes.c_int(len(ent["context_map"])),
        _ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), _ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]),
        _ptr(orders, ctypes.c_int32), _ptr(order_off, ctypes.c_int32),
        ctypes.c_int(shift),
        _ptr(coeff_pool, ctypes.c_int32),
        _ptr(slots_arr, ctypes.c_int32), ctypes.c_int64(chan_stride),
        _ptr(blocks_out, ctypes.c_int32) if blocks_out is not None else None,
        _ptr(blk_counts, ctypes.c_int32) if blk_counts is not None else None,
    )
    if ret == 4:
        raise InvalidHistogramIndex("invalid histogram index")
    if ret == 3:
        raise InvalidNumNonZeros("invalid number of nonzeros")
    if ret != 0:
        raise NativeDecodeError(f"native hf-groups decode failed (code {ret})")
    return [int(poss[i]) for i in range(n)]


def dct8_fused_native(
    coeffs3, offs, scales, xcc, bcc, mats, biases, lf3, idct8,
    out_planes, gbx, gby, fidx=None, frame_stride=0,
):
    """Fused dequant+CfL+IDCT8+scatter for 444 single-block DCT8 buckets.

    coeffs3: three int32 channel arrays (views sharing offs indexing);
    out_planes: three C-contiguous f32 planes (same width); with fidx,
    each plane pointer advances fidx[i]*frame_stride floats per block
    (batched animation layout). Returns False when unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    n = len(offs)
    if n == 0:
        return True
    ow = out_planes[0].shape[-1]
    lib.jxl_dct8_fused(
        _ptr(coeffs3[0], ctypes.c_int32), _ptr(coeffs3[1], ctypes.c_int32),
        _ptr(coeffs3[2], ctypes.c_int32),
        _ptr(offs, ctypes.c_int64), ctypes.c_int64(n),
        _ptr(scales, ctypes.c_float), _ptr(xcc, ctypes.c_float),
        _ptr(bcc, ctypes.c_float), _ptr(mats, ctypes.c_float),
        _ptr(biases, ctypes.c_float), _ptr(lf3, ctypes.c_float),
        _ptr(idct8, ctypes.c_float),
        _ptr(out_planes[0], ctypes.c_float), _ptr(out_planes[1], ctypes.c_float),
        _ptr(out_planes[2], ctypes.c_float),
        ctypes.c_int64(frame_stride),
        _ptr(fidx, ctypes.c_int32) if fidx is not None else None,
        _ptr(gbx, ctypes.c_int32), _ptr(gby, ctypes.c_int32),
        ctypes.c_int64(ow),
    )
    return True


def dither_u8_native(plane, dither, yoff: int, xoff: int, maxv: float):
    """Dithered f32 -> u8 plane (f32_to_u8 semantics) in one native pass.
    plane: (h, w) f32, row-strided OK. Returns u8 array or None."""
    lib = get_lib()
    if lib is None:
        return None
    if plane.dtype != np.float32 or plane.strides[1] != 4:
        return None
    dither = np.ascontiguousarray(dither, dtype=np.float32)
    h, w = plane.shape
    out = np.empty((h, w), dtype=np.uint8)
    lib.jxl_dither_u8(
        _ptr(plane, ctypes.c_float), ctypes.c_int64(h), ctypes.c_int64(w),
        ctypes.c_int64(plane.strides[0] // 4),
        _ptr(dither, ctypes.c_float),
        ctypes.c_int(yoff), ctypes.c_int(xoff), ctypes.c_float(maxv),
        _ptr(out, ctypes.c_uint8), ctypes.c_int64(w), ctypes.c_int64(1),
    )
    return out


def scatter_blocks_native(outp, pix, bx, by) -> bool:
    """Scatter (n, ph, pw) f32 blocks into `outp` at 8-px block coords.
    Returns False when unavailable or layouts don't qualify."""
    lib = get_lib()
    if lib is None:
        return False
    if (
        outp.dtype != np.float32
        or not outp.flags.c_contiguous
        or pix.dtype != np.float32
    ):
        return False
    pixc = pix if pix.flags.c_contiguous else np.ascontiguousarray(pix)
    n, ph, pw = pixc.shape
    lib.jxl_scatter_blocks(
        _ptr(outp, ctypes.c_float), ctypes.c_int64(outp.shape[1]),
        _ptr(pixc, ctypes.c_float), ctypes.c_int64(n),
        ctypes.c_int64(ph), ctypes.c_int64(pw),
        _ptr(np.ascontiguousarray(bx, dtype=np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(by, dtype=np.int32), ctypes.c_int32),
    )
    return True


def spline_splat_native(planes, splines) -> bool:
    """Additive in-place splat of `splines.segments` onto 3 contiguous or
    uniformly row-strided f32 planes. Returns False when unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    stride = planes[0].strides[0] // 4
    if any(
        not isinstance(p, np.ndarray)
        or p.dtype != np.float32
        or p.strides[1] != 4
        or p.strides[0] != stride * 4
        or not p.flags.writeable
        for p in planes[:3]
    ):
        return False
    segs = getattr(splines, "_native_segs", None)
    if segs is None:
        segs = np.empty((len(splines.segments), 8), dtype=np.float32)
        for i, s in enumerate(splines.segments):
            segs[i] = (
                s.center_x, s.center_y, s.maximum_distance, s.inv_sigma,
                s.sigma_over_4_times_intensity,
                s.color[0], s.color[1], s.color[2],
            )
        try:
            splines._native_segs = segs
        except AttributeError:
            pass
    h, w = planes[0].shape
    lib.jxl_spline_splat(
        _ptr(planes[0], ctypes.c_float), _ptr(planes[1], ctypes.c_float),
        _ptr(planes[2], ctypes.c_float),
        ctypes.c_int64(h), ctypes.c_int64(w), ctypes.c_int64(stride),
        _ptr(segs, ctypes.c_float), ctypes.c_int64(len(segs)),
    )
    return True


def gradient_reconstruct(arr: np.ndarray) -> None:
    """In-place clamped-gradient reconstruction of a residual plane
    (host fallback for the device wavefront reconstruction,
    modular/device_lossless.py). `arr` must be int32, C-contiguous rows
    (a row-sliced view of a larger plane is fine)."""
    h, w = arr.shape
    if h == 0 or w == 0:
        return
    lib = get_lib()
    assert lib is not None and arr.dtype == np.int32
    assert arr.strides[1] == 4
    lib.jxl_gradient_reconstruct(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(h), ctypes.c_int64(w),
        ctypes.c_int64(arr.strides[0] // 4),
    )


def apply_lehmer(code, n: int):
    """Order-statistics application of a Lehmer code: returns the int32
    index array `idx` with out[i] = base[idx[i]] (the i-th smallest
    still-unused position), or None when the native lib is unavailable.
    Raises InvalidPermutation on invalid code values."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidPermutation

    code_arr = np.asarray(code, dtype=np.uint32)
    out = np.empty(n, dtype=np.int32)
    ret = lib.jxl_apply_lehmer(
        _ptr(code_arr, ctypes.c_uint32),
        ctypes.c_int64(len(code_arr)),
        ctypes.c_int64(n),
        _ptr(out, ctypes.c_int32),
    )
    if ret != 0:
        raise InvalidPermutation("invalid Lehmer code value")
    return out


def filter_chain_native(
    planes, inv_sigma_px, gab_weights, epf_iters, rf, sigma_is_block=False,
    in_place=False,
):
    """Native gaborish + EPF chain over 3 whole-frame planes (in place).

    planes: list of 3 (h, w) f32 arrays — contiguous, or row-strided
    views (same stride) when in_place is set; inv_sigma_px: (h, w)
    stored 1/sigma — or, with sigma_is_block, the (ceil(h/8), ceil(w/8))
    per-block array expanded in-kernel — (None when epf_iters == 0);
    gab_weights: flat [w1_c0, w2_c0, ...] or None. Returns the filtered
    planes, or None if the native lib is unavailable (caller falls back).
    With in_place=True the caller's arrays are filtered IN PLACE (they
    must not alias live data the caller still needs unfiltered).
    Semantics: render/stages/core.py gaborish + epf_step_px at pos (0,0).
    """
    lib = get_lib()
    if lib is None:
        return None
    h, w = planes[0].shape
    if h < 8 or w < 8:
        return None  # mirror excursions need n >= border; numpy handles tiny frames
    if in_place:
        if any(not isinstance(p, np.ndarray) for p in planes):
            return None  # e.g. jax arrays: caller falls back
        stride = planes[0].strides[0] // 4
        if any(
            p.dtype != np.float32
            or p.strides[1] != 4
            or p.strides[0] != stride * 4
            or not p.flags.writeable
            for p in planes
        ):
            return None
        ps = list(planes)
    else:
        stride = w
        # the kernel filters in place: never alias the caller's arrays
        # (ascontiguousarray is a no-op on contiguous f32 input)
        ps = []
        for p in planes:
            q = np.ascontiguousarray(p, dtype=np.float32)
            ps.append(p.copy() if q is p else q)
    if inv_sigma_px is not None:
        if sigma_is_block:
            sbh, sbw = -(-h // 8), -(-w // 8)
            sig = np.ascontiguousarray(
                inv_sigma_px[:sbh, :sbw], dtype=np.float32
            )
        else:
            sig = np.ascontiguousarray(inv_sigma_px, dtype=np.float32)
        sigp = _ptr(sig, ctypes.c_float)
    else:
        sigp = None
    if gab_weights is not None:
        gw = np.asarray(gab_weights, dtype=np.float32).reshape(6)
        gwp = _ptr(gw, ctypes.c_float)
    else:
        gwp = None
    cs = np.asarray(rf.epf_channel_scale, dtype=np.float32)
    lib.jxl_filter_chain_strided(
        _ptr(ps[0], ctypes.c_float), _ptr(ps[1], ctypes.c_float),
        _ptr(ps[2], ctypes.c_float),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int64(stride),
        sigp, ctypes.c_int(1 if sigma_is_block else 0),
        gwp, ctypes.c_int(int(epf_iters)),
        _ptr(cs, ctypes.c_float),
        ctypes.c_float(float(rf.epf_pass0_sigma_scale)),
        ctypes.c_float(float(rf.epf_pass2_sigma_scale)),
        ctypes.c_float(float(rf.epf_border_sad_mul)),
    )
    return ps


def filter_chain_multi_native(
    stacked, offsets, hs, ws, stride, sigma_flat, sigma_offs, gab_weights,
    epf_iters, rf,
):
    """Batched per-frame gaborish+EPF over a stacked animation canvas
    (in place). stacked: (3, H_total, W) contiguous f32; frame i's planes
    start at element offset offsets[i] with shape (hs[i], ws[i]) on row
    stride `stride`; sigma_flat/sigma_offs hold each frame's raveled
    block-resolution 1/sigma (None when epf_iters == 0). Returns True, or
    False when the native lib is unavailable (caller falls back).
    Semantics: filter_chain_native per frame."""
    lib = get_lib()
    if lib is None:
        return False
    n = len(offsets)
    if n == 0:
        return True
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    hs_a = np.ascontiguousarray(hs, dtype=np.int32)
    ws_a = np.ascontiguousarray(ws, dtype=np.int32)
    if sigma_flat is not None:
        sig = np.ascontiguousarray(sigma_flat, dtype=np.float32)
        sigp = _ptr(sig, ctypes.c_float)
        soffs = np.ascontiguousarray(sigma_offs, dtype=np.int64)
        soffp = _ptr(soffs, ctypes.c_int64)
    else:
        sigp = soffp = None
    if gab_weights is not None:
        gw = np.asarray(gab_weights, dtype=np.float32).reshape(6)
        gwp = _ptr(gw, ctypes.c_float)
    else:
        gwp = None
    cs = np.asarray(rf.epf_channel_scale, dtype=np.float32)
    lib.jxl_filter_chain_multi(
        _ptr(stacked[0], ctypes.c_float), _ptr(stacked[1], ctypes.c_float),
        _ptr(stacked[2], ctypes.c_float),
        ctypes.c_int(n), _ptr(offs, ctypes.c_int64),
        _ptr(hs_a, ctypes.c_int32), _ptr(ws_a, ctypes.c_int32),
        ctypes.c_int64(stride), sigp, soffp,
        gwp, ctypes.c_int(int(epf_iters)),
        _ptr(cs, ctypes.c_float),
        ctypes.c_float(float(rf.epf_pass0_sigma_scale)),
        ctypes.c_float(float(rf.epf_pass2_sigma_scale)),
        ctypes.c_float(float(rf.epf_border_sad_mul)),
    )
    return True


def dequant_cfl_native(coeffs3, offs, nc, mats, scales, xcc, bcc, biases):
    """Gather + bias-adjust + dequant + CfL in one native pass.

    coeffs3: (3, total) int32 quantized coefficients; offs: (N,) start of
    each block's coeffs; mats: (3, nc) f32; scales: (N, 3); xcc/bcc: (N,).
    Returns (N, 3, nc) f32 dq, or None if the native lib is unavailable.
    Semantics: the dequant block of vardct/group.py _render_group."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(offs)
    if isinstance(coeffs3, (list, tuple)):
        # three 1-D channel views (e.g. a frame pool shifted by c*stride)
        c = [
            x if x.dtype == np.int32 and x.flags.c_contiguous
            else np.ascontiguousarray(x, dtype=np.int32)
            for x in coeffs3
        ]
    else:
        a = coeffs3
        if a.dtype != np.int32 or not a.flags.c_contiguous:
            a = np.ascontiguousarray(a, dtype=np.int32)
        c = a
    offs64 = np.ascontiguousarray(offs, dtype=np.int64)
    mats_f = mats if mats.dtype == np.float32 and mats.flags.c_contiguous else np.ascontiguousarray(mats, np.float32)
    scl = np.ascontiguousarray(scales, dtype=np.float32)
    xc = np.ascontiguousarray(xcc, dtype=np.float32)
    bc = np.ascontiguousarray(bcc, dtype=np.float32)
    bi = np.ascontiguousarray(biases, dtype=np.float32)
    out = np.empty((n, 3, nc), dtype=np.float32)
    lib.jxl_dequant_cfl(
        _ptr(c[0], ctypes.c_int32), _ptr(c[1], ctypes.c_int32),
        _ptr(c[2], ctypes.c_int32),
        _ptr(offs64, ctypes.c_int64), ctypes.c_int64(n), ctypes.c_int(nc),
        _ptr(mats_f, ctypes.c_float), _ptr(scl, ctypes.c_float),
        _ptr(xc, ctypes.c_float), _ptr(bc, ctypes.c_float),
        _ptr(bi, ctypes.c_float), _ptr(out, ctypes.c_float),
    )
    return out


def xyb_srgb_u8_native(
    planes, mat, biases, intensity_target, dither, tf_kind=0, tf_p0=0.0
):
    """Fused XYB -> linear -> display TF -> dithered u8 interleave.

    planes: 3 (h, w) f32 XYB; mat: 9 floats (possibly primaries-adapted
    inverse opsin); tf_kind: 0 sRGB, 1 PQ (tf_p0 = intensity/10000),
    2 BT.709, 3 gamma (tf_p0 = g), 4 linear. Returns (h, w, 3) u8 or None
    when unavailable. Semantics: xyb_to_linear + linear_to_* + f32_to_u8
    at pos (0,0)."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = planes[0].shape
    # row views (cropped padded planes) pass by stride; only planes with
    # non-unit inner stride still copy
    ps = [
        p if p.dtype == np.float32 and p.strides[1] == 4
        else np.ascontiguousarray(p, dtype=np.float32)
        for p in planes[:3]
    ]
    strides = np.array([p.strides[0] // 4 for p in ps], dtype=np.int64)
    m = np.ascontiguousarray(mat, dtype=np.float32).reshape(9)
    b = np.ascontiguousarray(biases, dtype=np.float32).reshape(3)
    d = np.ascontiguousarray(dither, dtype=np.float32).reshape(1024)
    out = np.empty((h, w, 3), dtype=np.uint8)
    lib.jxl_xyb_srgb_u8(
        _ptr(ps[0], ctypes.c_float), _ptr(ps[1], ctypes.c_float),
        _ptr(ps[2], ctypes.c_float), _ptr(strides, ctypes.c_int64),
        ctypes.c_int64(h), ctypes.c_int64(w),
        _ptr(m, ctypes.c_float), _ptr(b, ctypes.c_float),
        ctypes.c_float(255.0 / float(intensity_target)),
        _ptr(d, ctypes.c_float),
        ctypes.c_int(int(tf_kind)), ctypes.c_float(float(tf_p0)),
        _ptr(out, ctypes.c_uint8),
    )
    return out


def xyb_tf_f32_native(planes, mat, biases, intensity_target, tf_kind, tf_p0):
    """Fused XYB -> linear -> display TF, f32 planes modified IN PLACE.

    planes: 3 contiguous (h, w) f32 arrays (caller owns/copies them).
    Returns True on success, False when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    h, w = planes[0].shape
    m = np.ascontiguousarray(mat, dtype=np.float32).reshape(9)
    b = np.ascontiguousarray(biases, dtype=np.float32).reshape(3)
    lib.jxl_xyb_tf_f32(
        _ptr(planes[0], ctypes.c_float), _ptr(planes[1], ctypes.c_float),
        _ptr(planes[2], ctypes.c_float),
        ctypes.c_int64(h), ctypes.c_int64(w),
        _ptr(m, ctypes.c_float), _ptr(b, ctypes.c_float),
        ctypes.c_float(255.0 / float(intensity_target)),
        ctypes.c_int(int(tf_kind)), ctypes.c_float(float(tf_p0)),
    )
    return True


def noise_field_native(bufs, up, group_dim, gx_count, gy_count, vfi, nfi):
    """Fill 3 (hu, wu) f32 planes with the per-group xorshift128+ noise
    field IN PLACE (native twin of features/noise.py generate_noise_field).
    Returns True, or False when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    hu, wu = bufs[0].shape
    lib.jxl_noise_field(
        _ptr(bufs[0], ctypes.c_float), _ptr(bufs[1], ctypes.c_float),
        _ptr(bufs[2], ctypes.c_float),
        ctypes.c_int64(hu), ctypes.c_int64(wu),
        ctypes.c_int(int(up)), ctypes.c_int(int(group_dim)),
        ctypes.c_int(int(gx_count)), ctypes.c_int(int(gy_count)),
        ctypes.c_uint32(int(vfi)), ctypes.c_uint32(int(nfi)),
    )
    return True


def noise_field_rows_native(
    bufs, hu, wu, up, group_dim, gx_count, gy_count, vfi, nfi, y_lo, y_hi
):
    """Fill 3 (y_hi - y_lo, wu) f32 planes with absolute rows [y_lo, y_hi)
    of the per-group xorshift128+ noise field (banded low-memory path).
    Returns True, or False when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    lib.jxl_noise_field_rows(
        _ptr(bufs[0], ctypes.c_float), _ptr(bufs[1], ctypes.c_float),
        _ptr(bufs[2], ctypes.c_float),
        ctypes.c_int64(int(hu)), ctypes.c_int64(int(wu)),
        ctypes.c_int(int(up)), ctypes.c_int(int(group_dim)),
        ctypes.c_int(int(gx_count)), ctypes.c_int(int(gy_count)),
        ctypes.c_uint32(int(vfi)), ctypes.c_uint32(int(nfi)),
        ctypes.c_int64(int(y_lo)), ctypes.c_int64(int(y_hi)),
    )
    return True


def decode_icc_native(histograms, br, length: int):
    """Decode `length` ICC bytes (per-byte two-previous-byte context model,
    icc/decode.py read_icc semantics) natively. Returns bytes, or None
    when the native library is unavailable; raises typed errors on
    bitstream problems."""
    lib = get_lib()
    if lib is None:
        return None
    from ..errors import InvalidBitstream, InvalidIccStream

    ent = pack_entropy(histograms)
    out = np.zeros(max(length, 1), dtype=np.uint8)
    data = _databuf(br)
    bit_pos = ctypes.c_uint64(br.pos)
    ret = lib.jxl_decode_icc(
        data, ctypes.c_uint64(len(data)), ctypes.byref(bit_pos),
        ctypes.c_int(ent["use_prefix"]),
        _ptr(ent["ans_tables"], ctypes.c_int32), ctypes.c_int(ent["table_size"]),
        ctypes.c_int(ent["log_bucket"]),
        _ptr(ent["huff_offsets"], ctypes.c_int32),
        _ptr(ent["huff_bits"], ctypes.c_int32),
        _ptr(ent["huff_values"], ctypes.c_int32),
        _ptr(ent["context_map"], ctypes.c_uint8), ctypes.c_int(len(ent["context_map"])),
        _ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), _ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]), ctypes.c_uint32(0),
        ctypes.c_int64(length), _ptr(out, ctypes.c_uint8),
    )
    if ret == 3:
        raise InvalidIccStream("invalid ICC stream symbol")
    if ret == 2:
        # truncated input: the streaming machine rewinds and asks for more
        from ..errors import OutOfBounds

        raise OutOfBounds(1)
    if ret != 0:
        raise InvalidBitstream("ICC entropy stream decode failed")
    br.pos = bit_pos.value
    return out.tobytes()[:length]


def rct_native(ins, outs, op: int, perm: int) -> bool:
    """Fused in-place-safe RCT over three int32 planes (hostops.cc jxl_rct;
    ref transforms/rct.rs:18-50). ins/outs: 3 (h, w) int32 arrays (views
    OK; outs may alias ins). Returns False when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    h, w = ins[0].shape
    args = []
    for a in (*ins, *outs):
        assert a.dtype == np.int32 and a.strides[1] == 4, (a.dtype, a.strides)
        args.append(_ptr(a, ctypes.c_int32))
        args.append(ctypes.c_int64(a.strides[0] // 4))
    lib.jxl_rct(*args, ctypes.c_int64(w), ctypes.c_int64(h),
                ctypes.c_int(op), ctypes.c_int(perm))
    return True


def _plane_ptrs(planes, elem):
    ptrs = (ctypes.c_void_p * len(planes))()
    strides = np.empty(len(planes), dtype=np.int64)
    for i, p in enumerate(planes):
        assert p.strides[1] == elem, p.strides
        ptrs[i] = p.ctypes.data
        strides[i] = p.strides[0] // elem
    return ptrs, strides


def interleave_native(planes) -> "np.ndarray | None":
    """Interleave n same-shape 2-D planes into (h, w, n) in one pass
    (numpy's np.stack(axis=-1) allocates + strided-scatters ~100 MB temps
    on large images). f32/u8/u16 supported; None → caller falls back."""
    lib = get_lib()
    if lib is None or not planes:
        return None
    dt = planes[0].dtype
    fn = {np.dtype(np.float32): lib.jxl_interleave_f32,
          np.dtype(np.uint8): lib.jxl_interleave_u8,
          np.dtype(np.uint16): lib.jxl_interleave_u16}.get(dt)
    if fn is None:
        return None
    h, w = planes[0].shape
    if any(p.shape != (h, w) or p.dtype != dt for p in planes):
        return None
    ptrs, strides = _plane_ptrs(planes, dt.itemsize)
    out = np.empty((h, w, len(planes)), dtype=dt)
    fn(ptrs, _ptr(strides, ctypes.c_int64), ctypes.c_int(len(planes)),
       ctypes.c_int64(w), ctypes.c_int64(h), _ptr(out, None))
    return out


def i32_to_f32_scaled_native(plane, scale: float) -> "np.ndarray | None":
    """int32 plane * scale -> f32 in one pass (ConvertModularToF32 integer
    path, stages/convert.rs:345-)."""
    lib = get_lib()
    if lib is None or plane.dtype != np.int32 or plane.strides[1] != 4:
        return None
    h, w = plane.shape
    out = np.empty((h, w), dtype=np.float32)
    lib.jxl_i32_to_f32_scaled(
        _ptr(plane, ctypes.c_int32), ctypes.c_int64(plane.strides[0] // 4),
        ctypes.c_int64(w), ctypes.c_int64(h), ctypes.c_float(scale),
        _ptr(out, ctypes.c_float), ctypes.c_int64(w))
    return out


def i32_scaled_interleave_native(planes, scale: float) -> "np.ndarray | None":
    """n int32 planes -> (h, w, n) f32 * scale, fused single pass."""
    lib = get_lib()
    if lib is None or not planes:
        return None
    h, w = planes[0].shape
    if any(p.shape != (h, w) or p.dtype != np.int32 for p in planes):
        return None
    ptrs, strides = _plane_ptrs(planes, 4)
    out = np.empty((h, w, len(planes)), dtype=np.float32)
    lib.jxl_i32_scaled_interleave(
        ptrs, _ptr(strides, ctypes.c_int64), ctypes.c_int(len(planes)),
        ctypes.c_int64(w), ctypes.c_int64(h), ctypes.c_float(scale),
        _ptr(out, ctypes.c_float))
    return out


def squeeze_chain_raw(recs) -> bool:
    """One jxl_squeeze_chain call over pre-built (n, 11) int64 records
    with absolute buffer pointers (the whole-animation fold batches every
    frame's inverse squeeze steps into a single native call)."""
    lib = get_lib()
    if lib is None:
        return False
    recs = np.ascontiguousarray(recs, dtype=np.int64)
    lib.jxl_squeeze_chain(ctypes.c_int(len(recs)), _ptr(recs, ctypes.c_int64))
    return True


_ANIM_ARENA: dict = {}


def _anim_arena(key, shape, dtype):
    """Single-slot per-key buffer arena for the animation fold's large
    intermediate slabs. The previous decode's shims are dead by the time
    the next decode starts (decode_image copies pixels out), so reuse is
    safe; the arena holds one buffer per (name, geometry) key and evicts
    oldest-first so many distinct animation geometries cannot pin
    unbounded memory (the pool slab is ~0.8 MB/frame)."""
    buf = _ANIM_ARENA.pop(key, None)
    if buf is None or buf.shape != shape:
        buf = np.empty(shape, dtype)
    _ANIM_ARENA[key] = buf  # re-insert: dict order is LRU-ish
    while len(_ANIM_ARENA) > 6:
        _ANIM_ARENA.pop(next(iter(_ANIM_ARENA)))
    return buf


def anim_decode_frames_native(
    br, sec_bit_pos, sec_byte_end, bw, bh, tcw, tch, fbw, fbh, hshift3,
    vshift3, is444, smooth_flags, chan_counts, chan_tmpl_off, chan_template,
    chan_frame_elems, tree_size_limit, def_bctx_cmap, invalid_transform,
):
    """Whole-animation decode fold (modular_decode.cc jxl_anim_decode_frames):
    every eligible frame's LfGlobal tables -> modular section0 -> LF group ->
    HfGlobal -> HF-group AC in one native call. Returns a dict of per-frame
    output arrays, or None for fallback (unavailable / any stream shape the
    fold does not cover — the caller re-decodes through the per-frame path,
    so a None here is never a correctness event).
    Ref: frame/decode.rs:314-583, frame/group.rs:384-618."""
    lib = get_lib()
    if lib is None:
        return None
    from ..vardct.group import _CBX_ARR, _CBY_ARR, _SHAPE_ARR

    F = len(sec_bit_pos)
    nat, nat_off = _natural_orders_concat()
    # The two big slabs (37 MB pool + channel slab) come from a per-process
    # arena: repeated decodes (animation playback, --speedtest reps) would
    # otherwise pay ~9k page faults per decode re-faulting fresh np.zeros
    # pages. The C++ side zeroes each frame's used pool region itself and
    # stage 2 writes every channel pixel, so np.empty contents never leak.
    pool = _anim_arena(("pool", F), (F, 3, 65536), np.int32)
    chan = _anim_arena(("chan", F, chan_frame_elems), (F, max(chan_frame_elems, 1)), np.int32)
    out = {
        "scal": np.zeros((F, 24), np.int32),
        "dbl": np.zeros((F, 8), np.float64),
        "lfthr": np.zeros((F, 48), np.int32),
        "qfthr": np.zeros((F, 16), np.int32),
        "bctxmap": np.zeros((F, 2496), np.uint8),
        "gh": np.zeros((F, 96), np.int32),
        "lf": np.zeros((3, F, bh, bw), np.float32),
        "qlf": np.zeros((F, bh, bw), np.uint8),
        "tmap": np.full((F, bh, bw), invalid_transform, np.uint8),
        "rq": np.zeros((F, bh, bw), np.int32),
        "epf": np.zeros((F, bh, bw), np.uint8),
        "ytox": np.zeros((F, tch, tcw), np.int8),
        "ytob": np.zeros((F, tch, tcw), np.int8),
        "hfinfo": np.zeros((F, 2), np.int32),
        "pool": pool,
        "blocks": np.empty((F, 1024, 4), np.int32),
        "blk_counts": np.zeros(F, np.int32),
        "chan": chan,
    }
    err = np.full(2, -2, np.int32)
    stage_ns = np.zeros(8, np.int64)
    data = _databuf(br)
    ret = lib.jxl_anim_decode_frames(
        data, ctypes.c_uint64(len(data)), ctypes.c_int(F),
        _ptr(np.ascontiguousarray(sec_bit_pos, dtype=np.uint64), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(sec_byte_end, dtype=np.uint64), ctypes.c_uint64),
        ctypes.c_int(bw), ctypes.c_int(bh), ctypes.c_int(tcw), ctypes.c_int(tch),
        _ptr(np.ascontiguousarray(fbw, dtype=np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(fbh, dtype=np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(hshift3, dtype=np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(vshift3, dtype=np.int32), ctypes.c_int32),
        ctypes.c_int(is444),
        _ptr(np.ascontiguousarray(smooth_flags, dtype=np.uint8), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(chan_counts, dtype=np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(chan_tmpl_off, dtype=np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(chan_template, dtype=np.int64), ctypes.c_int64),
        ctypes.c_int64(chan_frame_elems), _ptr(out["chan"], ctypes.c_int32),
        ctypes.c_int64(tree_size_limit),
        _ptr(nat, ctypes.c_int32), _ptr(nat_off, ctypes.c_int32),
        _ptr(_CBX_ARR, ctypes.c_int32), _ptr(_CBY_ARR, ctypes.c_int32),
        _ptr(_SHAPE_ARR, ctypes.c_int32),
        ctypes.c_int(invalid_transform),
        _ptr(np.ascontiguousarray(def_bctx_cmap, dtype=np.uint8), ctypes.c_uint8),
        ctypes.c_int(15),
        _ptr(out["scal"], ctypes.c_int32), _ptr(out["dbl"], ctypes.c_double),
        _ptr(out["lfthr"], ctypes.c_int32), _ptr(out["qfthr"], ctypes.c_int32),
        _ptr(out["bctxmap"], ctypes.c_uint8), _ptr(out["gh"], ctypes.c_int32),
        _ptr(out["lf"], ctypes.c_float), _ptr(out["qlf"], ctypes.c_uint8),
        _ptr(out["tmap"], ctypes.c_uint8), _ptr(out["rq"], ctypes.c_int32),
        _ptr(out["epf"], ctypes.c_uint8),
        _ptr(out["ytox"], ctypes.c_int8), _ptr(out["ytob"], ctypes.c_int8),
        _ptr(out["hfinfo"], ctypes.c_int32), _ptr(out["pool"], ctypes.c_int32),
        _ptr(out["blocks"], ctypes.c_int32), _ptr(out["blk_counts"], ctypes.c_int32),
        _ptr(err, ctypes.c_int32), _ptr(stage_ns, ctypes.c_int64),
    )
    if ret != 0:
        from ..utils import trace

        trace.metrics.add("anim_fold_fallback", 1)
        return None
    from ..utils import trace

    for s in range(6):
        trace.metrics.add(f"anim_fold_stage{s}_ns", int(stage_ns[s]))
    return out
