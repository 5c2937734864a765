"""Production multi-chip sharded render on the virtual 8-device CPU mesh.

The TPU analog of the reference's low-memory pipeline halo machinery
(group_scheduler.rs topbottom buffers -> one ppermute exchange); sharded
output must match the whole-image program (borders recomputed redundantly,
like the reference re-renders borders)."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_dryrun_production_pipeline():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(2)


def test_halo_exchange_matches_mirror():
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from jxl_tpu.parallel.sharded_render import exchange_halo_rows, make_mesh

    mesh = make_mesh(8)
    rows, cols = 8 * 16, 32
    x = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)

    def local(x):
        return exchange_halo_rows(x, 4, "groups")

    fn = shard_map(local, mesh=mesh, in_specs=(P("groups", None),),
                   out_specs=P("groups", None))
    out = np.asarray(jax.jit(fn)(x)).reshape(8, 24, cols)
    # interior shard halos are real neighbor rows
    np.testing.assert_array_equal(out[1, :4], x[16 - 4 : 16])
    np.testing.assert_array_equal(out[1, -4:], x[32 : 32 + 4])
    # edge shards mirror
    np.testing.assert_array_equal(out[0, :4], x[:4][::-1])
    np.testing.assert_array_equal(out[-1, -4:], x[-4:][::-1])


@pytest.mark.slow
def test_sharded_full_vardct_frame():
    """Coefficients -> dequant+CfL+IDCT -> 2-D halo exchange -> filters ->
    color, all under a 2-D group mesh (VERDICT #8): the 2x2-mesh result
    must match the 1x1-mesh (unsharded) program exactly, and both must
    match the host decode."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from jxl_tpu.api.simple import decode_first_frame
    from jxl_tpu.parallel.sharded_render import sharded_vardct_frame

    import pathlib
    path = pathlib.Path("/root/reference/jxl/resources/test/green_queen_vardct_e3.jxl")
    if not path.exists():
        pytest.skip("corpus not available")

    df = decode_first_frame(path.read_bytes())
    frame = df.frame
    coeffs = frame.hf_global.hf_coefficients
    if not coeffs:
        pytest.skip("no retained coefficients")

    # the persistent compilation cache may hold executables AOT-compiled
    # with different CPU feature flags (gather/scatter lowering differs in
    # f32 rounding); the bit-identical gate needs both programs compiled
    # by THIS process's backend
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("gy", "gx"))
        mesh4 = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("gy", "gx"))
        out1 = sharded_vardct_frame(mesh1, frame, coeffs)
        out4 = sharded_vardct_frame(mesh4, frame, coeffs)
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
    assert out1.shape == out4.shape
    # bit-identical sharded-vs-unsharded (ref tests/macros.rs:38-47
    # pipeline equivalence gate; border pixels are computed redundantly
    # with the same op order on both shards)
    np.testing.assert_array_equal(out4, out1)

    # end-to-end: matches the host decode of the same frame
    from jxl_tpu.render.simple import color_transform, render_frame_channels_ex

    planes, color_done, _ = render_frame_channels_ex(frame, fuse=False)
    if not color_done:
        planes = color_transform(frame, planes)
    ref = np.stack([np.asarray(p) for p in planes[:3]])
    h = min(ref.shape[1], out1.shape[1])
    w = min(ref.shape[2], out1.shape[2])
    np.testing.assert_allclose(
        out1[:, :h, :w], ref[:, :h, :w], rtol=2e-3, atol=2e-3
    )
