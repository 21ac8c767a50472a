"""Binary checkpoint/resume: bit-identical continuation (SURVEY §5.4)."""

import numpy as np

from shud_tpu.driver.fused import FusedSimulation
from shud_tpu.io.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_bitexact_resume(tmp_path):
    a = FusedSimulation.create("ccw", base="/root/reference")
    a.advance_interval(240.0)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, a)

    b = FusedSimulation.create("ccw", base="/root/reference")
    load_checkpoint(ckpt, b)
    assert b.t == a.t
    assert int(b.bdf.nfe) == int(a.bdf.nfe)
    np.testing.assert_array_equal(np.asarray(b.bdf.y), np.asarray(a.bdf.y))
    np.testing.assert_array_equal(np.asarray(b.bdf.h), np.asarray(a.bdf.h))

    # continue both one interval: identical trajectories, counters, buckets
    a.advance_interval(240.0)
    b.advance_interval(240.0)
    np.testing.assert_array_equal(np.asarray(a.bdf.y), np.asarray(b.bdf.y))
    assert int(a.bdf.nfe) == int(b.bdf.nfe)
    np.testing.assert_array_equal(
        np.asarray(a.buckets.snow), np.asarray(b.buckets.snow)
    )
