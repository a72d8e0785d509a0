"""Golden-trajectory drift detection: the canonical suite's closed-loop
commands must match the recorded baselines (scripts/record_golden.py) for
every guarded operating point — footprint-live, u8 gather source, the
two-phase-LS bench point, rolling-window sim, adaptive compaction.
Regenerate the goldens only on INTENTIONAL behavior changes and say why in
the commit message."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

import record_golden

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


@pytest.mark.parametrize("variant", sorted(record_golden.VARIANTS))
def test_closed_loop_matches_golden(variant):
    path = GOLDEN_DIR / f"{variant}.npz"
    if not path.exists():
        pytest.skip(f"no golden recorded for {variant}")
    cmds, goal_dist = record_golden.run_suite(variant=variant)
    with np.load(path) as z:
        np.testing.assert_allclose(cmds, z["cmds"], atol=1e-4,
                                   err_msg=f"{variant}: commands drifted")
        np.testing.assert_allclose(goal_dist, z["goal_dist"], atol=1e-3)
