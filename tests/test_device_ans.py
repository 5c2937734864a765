"""Batched device rANS decode vs the host decoder, via an in-test encoder.

The encoder is the exact inverse of AnsHistogram.read (alias slots
enumerated into an inverse map), starting from the reference's final-state
checksum 0x130000 (ref ans.rs:441) so decode ends exactly there.
"""

import struct

import numpy as np
import pytest

from jxl_tpu.entropy.ans import SUM_PROBS, AnsHistogram

LOG_ALPHA = 8
TABLE_SIZE = 1 << LOG_ALPHA
LOG_BUCKET = 12 - LOG_ALPHA
BUCKET_SIZE = 1 << LOG_BUCKET
FINAL_STATE = 0x130000


def make_hist(dist):
    h = AnsHistogram.__new__(AnsHistogram)
    h.dist = list(dist)
    h.log_bucket_size = LOG_BUCKET
    h.bucket_mask = BUCKET_SIZE - 1
    h.single_symbol = None
    h._build_alias_map(TABLE_SIZE, BUCKET_SIZE)
    return h


def inverse_map(h):
    inv = {}
    for idx in range(SUM_PROBS):
        i = idx >> LOG_BUCKET
        pos = idx & (BUCKET_SIZE - 1)
        if pos >= h.alias_cutoff[i]:
            sym, off = h.alias_symbol[i], h.alias_offset[i] + pos
        else:
            sym, off = i, pos
        assert (sym, off) not in inv
        inv[(sym, off)] = idx
    return inv


def ans_encode(symbols, h) -> bytes:
    inv = inverse_map(h)
    state = FINAL_STATE
    words = []
    for sym in reversed(symbols):
        freq = h.dist[sym]
        assert freq > 0
        if state >= (freq << 20):
            words.append(state & 0xFFFF)
            state >>= 16
        state = (state // freq) * SUM_PROBS + inv[(sym, state % freq)]
    out = struct.pack("<I", state)
    for w in reversed(words):
        out += struct.pack("<H", w)
    return out


def random_dist(rng, nsyms):
    w = rng.integers(1, 100, nsyms).astype(np.float64)
    d = np.floor(w / w.sum() * SUM_PROBS).astype(int)
    d[0] += SUM_PROBS - d.sum()
    dist = [0] * TABLE_SIZE
    for i, v in enumerate(d):
        dist[i] = int(v)
    return dist


def host_decode(data, h, n):
    """Decode with the host bit reader + AnsHistogram.read."""
    from jxl_tpu.io.bit_reader import BitReader

    br = BitReader(data)
    state = br.read(32)
    out = []
    for _ in range(n):
        sym, state = h.read(br, state)
        out.append(sym)
    return out, state


def test_roundtrip_host():
    rng = np.random.default_rng(0)
    h = make_hist(random_dist(rng, 40))
    probs = np.array(h.dist[:40], dtype=np.float64)
    syms = rng.choice(40, size=500, p=probs / probs.sum()).tolist()
    data = ans_encode(syms, h)
    dec, state = host_decode(data, h, len(syms))
    assert dec == syms
    assert state == FINAL_STATE  # ref ans.rs:441 check_final_state


def test_device_matches_host():
    from jxl_tpu.ops.device_ans import ans_decode_batch, pack_table

    rng = np.random.default_rng(1)
    h = make_hist(random_dist(rng, 64))
    probs = np.array(h.dist[:64], dtype=np.float64)
    probs /= probs.sum()
    n_streams, n_tokens = 128, 300
    streams = []
    expected = []
    maxlen = 0
    for _ in range(n_streams):
        syms = rng.choice(64, size=n_tokens, p=probs).tolist()
        data = ans_encode(syms, h)
        streams.append(data)
        expected.append(syms)
        maxlen = max(maxlen, len(data))
    buf = np.zeros((n_streams, maxlen + 4), dtype=np.uint8)
    for i, d in enumerate(streams):
        buf[i, : len(d)] = np.frombuffer(d, np.uint8)

    toks, final = ans_decode_batch(buf, pack_table(h), LOG_BUCKET, n_tokens)
    assert np.array_equal(np.asarray(toks), np.array(expected))
    assert np.all(np.asarray(final) == FINAL_STATE)


class BitWriter:
    def __init__(self):
        self.bits = 0
        self.n = 0
        self.out = bytearray()

    def write(self, value, nbits):
        self.bits |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.bits & 0xFF)
            self.bits >>= 8
            self.n -= 8

    def finish(self):
        if self.n:
            self.out.append(self.bits & 0xFF)
        return bytes(self.out)


def encode_uint_stream(values, clusters, hists, cfgs):
    """Inverse of read_unsigned_clustered: ANS tokens (backward pass) with
    interleaved HybridUint tail bits (forward emission)."""
    invs = [inverse_map(h) for h in hists]
    toks, raws = [], []
    for v, c in zip(values, clusters):
        cfg = cfgs[c]
        if v < cfg.split_token:
            toks.append(v)
            raws.append((0, 0))
        else:
            # invert hybrid_uint: value -> token + nbits raw bits
            n = v.bit_length() - 1  # index of the leading 1
            nbits = n - cfg.msb_in_token - cfg.lsb_in_token
            low = v & ((1 << cfg.lsb_in_token) - 1)
            hi_all = v >> (cfg.lsb_in_token + nbits)
            msb_bits = hi_all & ((1 << cfg.msb_in_token) - 1)
            raw = (v >> cfg.lsb_in_token) & ((1 << nbits) - 1)
            token = (
                cfg.split_token
                + (((n - cfg.split_exponent) << (cfg.msb_in_token + cfg.lsb_in_token))
                   | (msb_bits << cfg.lsb_in_token) | low)
            )
            toks.append(token)
            raws.append((nbits, raw))

    state = FINAL_STATE
    words = {}
    for k in range(len(toks) - 1, -1, -1):
        h = hists[clusters[k]]
        freq = h.dist[toks[k]]
        assert freq > 0, (k, toks[k])
        if state >= (freq << 20):
            words[k] = state & 0xFFFF
            state >>= 16
        state = (state // freq) * SUM_PROBS + invs[clusters[k]][(toks[k], state % freq)]

    bw = BitWriter()
    bw.write(state, 32)
    for k in range(len(toks)):
        if k in words:
            bw.write(words[k], 16)
        nbits, raw = raws[k]
        if nbits:
            bw.write(raw, nbits)
    return bw.finish()


def test_clustered_uint_device_matches_host():
    from jxl_tpu.entropy.hybrid_uint import HybridUint
    from jxl_tpu.ops.device_ans import (
        ans_read_uint_batch,
        pack_clustered_tables,
        pack_uint_configs,
    )

    rng = np.random.default_rng(7)
    hists = [make_hist(random_dist(rng, 64)) for _ in range(3)]
    cfgs = [HybridUint(4, 2, 0), HybridUint(4, 1, 1), HybridUint(6, 2, 1)]

    n_streams, n_tokens = 64, 200
    bufs, clusters_all, expected = [], [], []
    maxlen = 0
    for _ in range(n_streams):
        clusters = rng.integers(0, 3, n_tokens).tolist()
        values = []
        for c in clusters:
            # mix of small tokens and multi-bit values
            values.append(int(rng.integers(0, 4000)))
        # clamp values whose token has zero probability in its cluster
        vals = []
        for v, c in zip(values, clusters):
            h, cfg = hists[c], cfgs[c]
            while True:
                if v < cfg.split_token:
                    tok = v
                else:
                    n = v.bit_length() - 1
                    nb = n - cfg.msb_in_token - cfg.lsb_in_token
                    if nb < 0:
                        v = int(rng.integers(0, cfg.split_token))
                        continue
                    low = v & ((1 << cfg.lsb_in_token) - 1)
                    msb_bits = (v >> (cfg.lsb_in_token + nb)) & (
                        (1 << cfg.msb_in_token) - 1
                    )
                    tok = cfg.split_token + (
                        ((n - cfg.split_exponent) << (cfg.msb_in_token + cfg.lsb_in_token))
                        | (msb_bits << cfg.lsb_in_token) | low
                    )
                if tok < 64 and hists[c].dist[tok] > 0:
                    break
                v = int(rng.integers(0, 16))
            vals.append(v)
        data = encode_uint_stream(vals, clusters, hists, cfgs)
        bufs.append(data)
        clusters_all.append(clusters)
        expected.append(vals)
        maxlen = max(maxlen, len(data))

    buf = np.zeros((n_streams, maxlen + 6), dtype=np.uint8)
    for i, d in enumerate(bufs):
        buf[i, : len(d)] = np.frombuffer(d, np.uint8)

    vals, final = ans_read_uint_batch(
        buf,
        pack_clustered_tables(hists),
        pack_uint_configs(cfgs),
        np.array(clusters_all, dtype=np.int32),
        LOG_BUCKET,
        n_tokens,
    )
    assert np.array_equal(np.asarray(vals), np.array(expected, dtype=np.uint32))
    assert np.all(np.asarray(final) == FINAL_STATE)
