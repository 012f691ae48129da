"""examples/evaluation — the one-screen model-eval audit runs
end-to-end at sf0.001 and every report number is present and sane."""

from __future__ import annotations

import importlib.util
import os

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "evaluation",
    "example.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("evaluation_example", EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_evaluation_example_runs():
    rep = _load().main("/root/testdata/sf0.001", stop_session=False)
    # per-class table covers both classes with valid rates
    assert set(rep["per_class"]) == {"true", "false"}
    for p, r, f in rep["per_class"].values():
        for x in (p, r, f):
            assert x is None or 0.0 <= x <= 1.0
    # the B-threshold flips 100+ decisions vs A on this corpus: the
    # paired test must see them and the omnibus must reject
    m = rep["mcnemar"]
    assert m["n_pairs"] == m["both_correct"] + m["both_wrong"] + m[
        "only_a"
    ] + m["only_b"]
    assert m["chi2"] is not None and m["chi2"] > 3.84
    assert rep["cochran_q"]["q"] > 5.99
    # overlapping bucketings agree strongly but not perfectly
    assert 0.5 < rep["kappa_w"]["kappa"] < 1.0
    # Murphy identity to rounding
    b = rep["brier"]
    assert (
        abs(
            b["brier"]
            - (b["reliability"] - b["resolution"] + b["uncertainty"])
        )
        < 5e-6
    )
    assert rep["effect"]["d"] is not None
