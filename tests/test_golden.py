"""Golden-trajectory drift detection: the canonical suite's closed-loop
commands must match the recorded baselines (scripts/record_golden.py).
Regenerate the goldens only on INTENTIONAL behavior changes and say why in
the commit message."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden" / "mpo700_closed_loop.npz"


@pytest.mark.skipif(not GOLDEN.exists(), reason="no golden recorded")
def test_closed_loop_matches_golden():
    import record_golden

    cmds, goal_dist = record_golden.run_suite()
    with np.load(GOLDEN) as z:
        np.testing.assert_allclose(cmds, z["cmds"], atol=1e-4,
                                   err_msg="commands drifted from golden")
        np.testing.assert_allclose(goal_dist, z["goal_dist"], atol=1e-3)
