"""examples/audit — the one-screen corpus audit runs end-to-end at
sf0.001 and every report number is present and sane."""

from __future__ import annotations

import importlib.util
import os

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "audit",
    "example.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("audit_example", EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_audit_example_runs():
    rep = _load().main("/root/testdata/sf0.001", stop_session=False)
    assert rep["vocab_now"] > 0
    assert rep["vocab_at_1000x"] >= rep["vocab_now"]
    assert rep["types_for_99pct"] > 0
    assert 0.0 <= rep["max_source_gini"] <= 1.0
    assert rep["lang_source_dof"] > 0
    assert 0.0 <= rep["min_source_jsd"] <= 1.0
    assert -1.0 <= rep["max_centroid_cos"] <= 1.0
    assert rep["containment_pairs"] >= 0
    assert -1.0 <= rep["random_pair_cos"] <= 1.0
    assert rep["split_leak_pairs"] >= 0
    assert rep["volume_drift_alarms"] >= 0
