"""examples/monitoring — the one-screen feed-drift monitor runs
end-to-end at sf0.001 and every report number is present and sane."""

from __future__ import annotations

import importlib.util
import os

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "monitoring",
    "example.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("monitoring_example", EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_monitoring_example_runs():
    rep = _load().main("/root/testdata/sf0.001", stop_session=False)
    assert rep["psi_feed_days"] > 0
    assert 0 <= rep["psi_drifted_days"] <= rep["psi_feed_days"]
    assert rep["psi_max"] >= 0.0
    assert 0.0 <= rep["ks_max"] <= 1.0
    assert rep["median_shift_max_abs"] >= 0.0
    # the synthetic 10% replay must actually flag
    assert rep["replay_days_flagged"] > 0
    assert 0.0 < rep["replay_rate_max"] <= 1.0
    assert 0.0 <= rep["vocab_novelty_last"] <= 1.0
