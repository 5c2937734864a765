"""Pallas fused filter kernel vs the stage-math oracle.

Runs the kernel in interpreter mode on CPU (slow) — the driver exercises
the compiled path on real TPU hardware via bench/decode.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.slow
def test_pallas_epf_matches_oracle():
    from jxl_tpu.ops.pallas_epf import epf_gab_pallas
    from jxl_tpu.render.stages import core as st

    rng = np.random.default_rng(0)
    h, w = 150, 200
    planes = rng.normal(size=(3, h, w)).astype(np.float32)
    sigma = rng.uniform(-3.0, -0.5, size=(h, w)).astype(np.float32)

    class RF:
        epf_channel_scale = [40.0, 5.0, 3.5]
        epf_pass0_sigma_scale = 0.9
        epf_pass2_sigma_scale = 6.5
        epf_border_sad_mul = 2.0 / 3.0
        epf_sharp_lut = None

    rf = RF()
    gw = ((0.115169525, 0.061248592),) * 3

    chans = [jnp.asarray(p) for p in planes]
    chans = [st.gaborish(jnp, c, w1, w2) for c, (w1, w2) in zip(chans, gw)]
    for s in (0, 1, 2):
        chans = st.epf_step_px(jnp, chans, jnp.asarray(sigma), rf, s)
    ref = np.stack([np.asarray(c) for c in chans])

    out = np.asarray(
        epf_gab_pallas(
            planes, sigma, gw, 3, 0.9, 6.5, 2.0 / 3.0, (40.0, 5.0, 3.5),
            interpret=True,
        )
    )
    d = np.abs(out - ref)
    # a few float ULPs of slack: op fusion order inside the kernel differs
    # slightly from the eager stage chain, and the border ring uses a single
    # pre-mirror instead of per-stage mirrors
    assert d.max() < 1e-5
    assert d[:, 8:-8, 8:-8].max() < 1e-6
