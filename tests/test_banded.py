"""Bounded-memory (banded) decode: correctness + O(band) peak RSS.

Mirrors the reference's low-memory pipeline guarantees
(render/low_memory_pipeline/: row rings + group streaming keep memory
O(groups-in-flight), not O(image)).
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from mini_encoder import encode_constant_modular

from jxl_tpu.api.banded import decode_banded, eligible
from jxl_tpu.api.decoder import Event, JxlDecoder
from jxl_tpu.errors import NotSupported

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def _one_shot(data):
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    return d.frames[0]


def test_banded_matches_one_shot_modular():
    data = encode_constant_modular(2100, 1100, 77)
    bands = {}
    info = decode_banded(data, lambda y0, arr: bands.__setitem__(y0, arr))
    assert info["bands"] == 5
    full = np.concatenate([bands[k] for k in sorted(bands)], axis=0)
    ref = _one_shot(data)
    assert full.shape == ref.shape
    np.testing.assert_allclose(full, ref, rtol=0, atol=1e-6)


def test_banded_matches_one_shot_vardct():
    data = (CORPUS / "zoltan_tasi_unsplash.jxl").read_bytes()
    bands = {}
    decode_banded(data, lambda y0, arr: bands.__setitem__(y0, arr))
    full = np.concatenate([bands[k] for k in sorted(bands)], axis=0)
    ref = _one_shot(data)
    assert full.shape == ref.shape
    # one-shot runs the fused jnp filter program; banded runs numpy — 1-2
    # ulp reassociation
    np.testing.assert_allclose(full, ref, rtol=0, atol=5e-5)


def test_banded_matches_one_shot_noise():
    """Noise eligibility (band-local xorshift128+ field generation) must
    be pixel-identical to the whole-image noise stage on real content
    (conformance noise.jxl: VarDCT + film grain, 3 bands)."""
    data = (CORPUS / "conformance_test_images/noise.jxl").read_bytes()
    bands = {}
    info = decode_banded(data, lambda y0, arr: bands.__setitem__(y0, arr))
    assert info["bands"] >= 2
    full = np.concatenate([bands[k] for k in sorted(bands)], axis=0)
    ref = _one_shot(data)
    assert full.shape == ref.shape
    np.testing.assert_allclose(full, ref, rtol=0, atol=5e-5)


def test_banded_matches_one_shot_modular_ec():
    """Modular extra-channel eligibility: a 600x700 + alpha stream whose
    MA tree splits on stream id (different groups decode different
    values) — banded output including the EC plane must match one-shot.
    The stream-id split catches band/group misordering, not just
    per-band plumbing."""
    from mini_encoder import write_split_tree

    def tw(w):
        write_split_tree(w, 1, 24, 1, -2)  # prop 1 = stream id

    data = encode_constant_modular(600, 700, tree_writer=tw, num_ec=1)
    bands = {}
    info = decode_banded(data, lambda y0, arr: bands.__setitem__(y0, arr))
    assert info["bands"] == 3
    full = np.concatenate([bands[k] for k in sorted(bands)], axis=0)
    ref = _one_shot(data)
    assert full.shape == ref.shape and full.shape[-1] == 4
    # color channels pass through gaborish+EPF (numpy vs fused jnp: ulp)
    np.testing.assert_allclose(full[..., :3], ref[..., :3], rtol=0, atol=1e-6)
    # the EC plane is untouched by filters and must be bit-exact
    np.testing.assert_array_equal(full[..., 3], ref[..., 3])
    # content really varies across groups (guards against a trivially
    # constant image hiding misalignment)
    assert np.unique(ref[..., 3]).size >= 2


def test_noise_field_rows_matches_whole_field():
    """generate_noise_field_rows must be bit-identical to the same slice
    of the whole-image field generator, across slices that start/end
    mid-group and mid-subregion (noise.jxl: 500x606, 2 group rows)."""
    from jxl_tpu.api.simple import decode_first_frame
    from jxl_tpu.features.noise import (
        generate_noise_field,
        generate_noise_field_rows,
    )

    data = (CORPUS / "conformance_test_images/noise.jxl").read_bytes()
    frame = decode_first_frame(data).frame
    whole = generate_noise_field(frame)
    for (lo, hi) in [(0, 5), (250, 262), (100, 300), (254, 258), (600, 606)]:
        rows = generate_noise_field_rows(frame, lo, hi)
        for c in range(3):
            np.testing.assert_array_equal(rows[c], whole[c][lo:hi])


def test_ineligible_falls_through():
    data = (CORPUS / "conformance_test_images/patches.jxl").read_bytes()
    with pytest.raises(NotSupported):
        decode_banded(data, lambda *a: None)


_RSS_SCRIPT = r"""
import resource, sys, pathlib
sys.path.insert(0, "tests")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mini_encoder import encode_constant_modular
from jxl_tpu.api.banded import decode_banded

W, H = 8192, 8192  # 67 MP: whole-image i32+f32 planes would need ~1.6 GB
data = encode_constant_modular(W, H, 200, filters=False)
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
seen = [0, None]
def emit(y0, arr):
    seen[0] += arr.shape[0]
    seen[1] = float(arr[0, 0, 0])
decode_banded(data, emit, pixel_format="u8")
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
assert seen[0] == H, seen
delta_mb = (peak - base) / 1024.0
print("RSS_DELTA_MB", delta_mb)
# band working set: ~3 bands of 256x8192x3 in i32+f32 ≈ 150 MB; allow 4x
assert delta_mb < 600, delta_mb
"""


@pytest.mark.slow
def test_banded_64mp_bounded_rss():
    """Decode a synthetic 67 MP image with peak RSS growth far below the
    whole-image footprint (O(band), VERDICT #8)."""
    r = subprocess.run(
        [sys.executable, "-c", _RSS_SCRIPT],
        capture_output=True,
        text=True,
        cwd=str(pathlib.Path(__file__).parent.parent),
        timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "RSS_DELTA_MB" in r.stdout
