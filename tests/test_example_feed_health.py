"""examples/feed_health — the one-screen feed-health panel runs
end-to-end at sf0.001 and every number is present and sane."""

from __future__ import annotations

import importlib.util
import os

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "feed_health",
    "example.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("feed_health_example", EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_feed_health_example_runs():
    rep = _load().main("/root/testdata/sf0.001", stop_session=False)
    # all five event types get a shape row with finite numbers
    assert len(rep["shape"]) == 5
    for sk, ku, jb in rep["shape"].values():
        assert sk is not None and ku is not None and jb is not None
        assert jb >= 0.0
    # spread/location screens emit the full scalar rows
    assert rep["bartlett"]["k_groups"] == 5
    assert rep["mood"]["k_groups"] == 5 and rep["mood"]["chi2"] is not None
    # click vs purchase: CvM and delta defined, QQ covers 9 deciles
    assert rep["cvm"]["t"] is not None and rep["cvm"]["t"] >= 0.0
    assert len(rep["qq"]) == 9
    assert rep["cliffs"]["delta"] is not None
    assert -1.0 <= rep["cliffs"]["delta"] <= 1.0
    # every type has a DW in [0, 4] and a finite robust slope
    assert set(rep["dw"]) == set(rep["shape"])
    for dw in rep["dw"].values():
        assert dw is None or 0.0 <= dw <= 4.0
    assert set(rep["slope"]) == set(rep["shape"])
    # the lead-lag scan found a defined peak
    assert rep["ccf_peak"] is not None
    lag, ccf = rep["ccf_peak"]
    assert -6 <= lag <= 6 and -1.0 <= ccf <= 1.0
