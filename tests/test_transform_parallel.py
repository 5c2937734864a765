"""Dependency-counted parallel transform-step scheduling (VERDICT r04 #8;
ref transforms/step.rs:245-269): independent units run concurrently when
JXL_TPU_THREADS > 1 and the result is bit-exact vs the serial walk."""

import copy
import os

import numpy as np
import pytest

from jxl_tpu.modular.channel import ModularChannel
from jxl_tpu.modular.transforms import (
    RctStep,
    SqueezeStep,
    _apply_units_parallel,
    _build_units,
    inverse_apply_steps,
)


def _chan(h, w, rng):
    c = ModularChannel((w, h), (0, 0), 8)
    c.data[...] = rng.integers(-(1 << 12), 1 << 12, size=(h, w), dtype=np.int32)
    return c


def _make_case(seed=0):
    """Storage + step list with real parallelism: an RCT over channels
    0..5 and two independent squeeze chains (channels 6..8 and 9..11).

    Decode order (reversed steps): the two squeeze chains share no
    buffers with each other or the RCT, so the scheduler may run all
    three concurrently; order cannot affect the output."""
    rng = np.random.default_rng(seed)
    storage = [
        # RCT: in 0,1,2 -> out 3,4,5
        _chan(16, 16, rng), _chan(16, 16, rng), _chan(16, 16, rng),
        _chan(16, 16, rng), _chan(16, 16, rng), _chan(16, 16, rng),
        # squeeze chain A: avg 6 + res 7 -> out 8 (16x8 + 16x8 -> 16x16)
        _chan(16, 8, rng), _chan(16, 8, rng), _chan(16, 16, rng),
        # squeeze chain B (vertical): avg 9 + res 10 -> out 11
        _chan(8, 16, rng), _chan(8, 16, rng), _chan(16, 16, rng),
    ]
    steps = [
        # steps are listed in FORWARD order; inverse_apply_steps reverses
        SqueezeStep(horizontal=False, buf_in=[9, 10], buf_out=11),
        SqueezeStep(horizontal=True, buf_in=[6, 7], buf_out=8),
        RctStep(buf_in=[0, 1, 2], buf_out=[3, 4, 5], op=6, perm=0),
    ]
    return storage, steps


def test_units_and_dependencies():
    storage, steps = _make_case()
    units = _build_units(steps)
    # reversed order: RCT, squeeze(h), squeeze(v) — squeezes not adjacent
    # to each other in this list, so three units
    assert len(units) == 3


def test_parallel_bitexact_vs_serial():
    serial_storage, steps = _make_case(seed=7)
    parallel_storage = copy.deepcopy(serial_storage)

    old = os.environ.get("JXL_TPU_THREADS")
    try:
        os.environ["JXL_TPU_THREADS"] = "1"
        inverse_apply_steps(steps, serial_storage)
        os.environ["JXL_TPU_THREADS"] = "4"
        inverse_apply_steps(steps, parallel_storage)
    finally:
        if old is None:
            os.environ.pop("JXL_TPU_THREADS", None)
        else:
            os.environ["JXL_TPU_THREADS"] = old

    for a, b in zip(serial_storage, parallel_storage):
        np.testing.assert_array_equal(a.data, b.data)


def test_parallel_stress_many_seeds():
    """Scheduler determinism under repeated concurrent execution."""
    for seed in range(12):
        base, steps = _make_case(seed=seed)
        ref = copy.deepcopy(base)
        units = _build_units(steps)
        for u in units:
            from jxl_tpu.modular.transforms import _apply_one_unit

            _apply_one_unit(u, ref)
        par = copy.deepcopy(base)
        _apply_units_parallel(units, par, n_workers=4)
        for a, b in zip(ref, par):
            np.testing.assert_array_equal(a.data, b.data)


def test_parallel_error_propagates():
    storage, steps = _make_case()
    bad = [SqueezeStep(horizontal=True, buf_in=[0, 1], buf_out=99)] + steps
    with pytest.raises(Exception):
        os.environ["JXL_TPU_THREADS"] = "4"
        try:
            inverse_apply_steps(bad, storage)
        finally:
            os.environ.pop("JXL_TPU_THREADS", None)


def test_parallel_engages_concurrently():
    """At least two units must be in flight at once with enough workers
    (the 'concurrent when workers exist' done-criterion)."""
    import threading

    from jxl_tpu.modular import transforms as tr

    storage, steps = _make_case()
    units = _build_units(steps)
    seen = {"max": 0, "cur": 0}
    lock = threading.Lock()
    gate = threading.Barrier(2, timeout=10)
    orig = tr._apply_one_unit

    def slow_apply(unit, st):
        with lock:
            seen["cur"] += 1
            seen["max"] = max(seen["max"], seen["cur"])
        try:
            gate.wait()  # two units must arrive here together
        except threading.BrokenBarrierError:
            pass
        orig(unit, st)
        with lock:
            seen["cur"] -= 1

    tr._apply_one_unit = slow_apply
    try:
        _apply_units_parallel(units, storage, n_workers=4)
    finally:
        tr._apply_one_unit = orig
    assert seen["max"] >= 2
