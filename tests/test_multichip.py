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
