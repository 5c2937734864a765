"""Pallas lockstep rANS kernel (ops/pallas_ans.py) vs the XLA scan twin
(ops/device_ans.py) — identical tokens and final states on real encoded
streams (interpret mode on the CPU mesh; compiled on real TPU)."""

import numpy as np

from jxl_tpu.ops.device_ans import ans_decode_batch, pack_table
from jxl_tpu.ops.pallas_ans import ans_decode_batch_pallas

from test_device_ans import FINAL_STATE, LOG_BUCKET, ans_encode, make_hist, random_dist


def test_pallas_matches_xla_scan():
    rng = np.random.default_rng(3)
    h = make_hist(random_dist(rng, 48))
    probs = np.array(h.dist[:48], dtype=np.float64)
    probs /= probs.sum()
    n_streams, n_tokens = 16, 200
    streams, expected = [], []
    maxlen = 0
    for _ in range(n_streams):
        syms = rng.choice(48, size=n_tokens, p=probs).tolist()
        data = ans_encode(syms, h)
        streams.append(data)
        expected.append(syms)
        maxlen = max(maxlen, len(data))
    buf = np.zeros((n_streams, maxlen + 4), dtype=np.uint8)
    for i, d in enumerate(streams):
        buf[i, : len(d)] = np.frombuffer(d, np.uint8)

    table = pack_table(h)
    ref_toks, ref_final = ans_decode_batch(buf, table, LOG_BUCKET, n_tokens)
    toks, final = ans_decode_batch_pallas(
        buf, table, LOG_BUCKET, n_tokens, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(final), np.asarray(ref_final))
    assert np.all(np.asarray(final) == FINAL_STATE)


def test_bench_helper_runs():
    from jxl_tpu.ops.pallas_ans import bench_step_cost
    import jax

    if jax.default_backend() != "cpu":
        import pytest

        pytest.skip("bench smoke only on the CPU mesh")
    # tiny smoke: the helper builds tables, runs both paths, returns costs
    r = bench_step_cost(s_count=8, num_tokens=64, reps=1)
    assert set(r) == {"xla", "pallas"} and all(v > 0 for v in r.values())
