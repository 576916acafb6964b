"""Opt-in released-checkpoint golden gate (scripts/golden_gate.py).

Dormant until the released torch checkpoints are dropped into
checkpoints/{celeb,places}/ (they are not downloadable in this
environment); then asserts <=1e-3 mean L1 vs the reference's committed
golden result PNGs through the exact test_celeb.sh / test_places.sh flows.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import golden_gate  # noqa: E402


@pytest.mark.parametrize("name", ["celeb", "places"])
def test_released_checkpoint_golden_gate(name):
    if not golden_gate.checkpoints_present(name):
        pytest.skip(f"released checkpoints for '{name}' not present "
                    f"(checkpoints/{name}/latest_net_{{M,G}}.pth)")
    rep = golden_gate.run_set(name, tol=1e-3)
    assert rep["status"] == "pass", rep
