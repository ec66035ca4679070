"""Substrate metadata guard of tools/deep_index_probe._ensure_index
(VERDICT r14 #5): a persisted probe substrate records its build regime
(n, trees, leaf, sigma/gaussian) in substrate_meta.json, and rebuilds
go THROUGH that record — the r14 hazard was a reclaimed sigma=1.0
hard-regime substrate silently rebuilt as the easy sigma=0.25 corpus
under the same name, poisoning every number measured on it afterwards.
No Spark session needed: the rebuild call is monkeypatched."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

import deep_index_probe  # noqa: E402


def _stamp(d, **kw):
    meta = {
        "n": 500, "dim": 300, "num_trees": 5, "leaf": 5, "seed": 42,
        "gaussian": False, "sigma": 1.0, "batch": 10,
    }
    meta.update(kw)
    with open(os.path.join(d, "substrate_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def test_reclaimed_substrate_rebuilds_from_meta(tmp_path, monkeypatch):
    """Index absent + meta present: the rebuild argv must carry the
    RECORDED regime (--sigma 1.0), not the probe's flag guesses."""
    d = str(tmp_path / "sub")
    os.makedirs(d)
    _stamp(d)
    calls = []
    monkeypatch.setattr(
        deep_index_probe.subprocess, "run",
        lambda argv, **kw: calls.append(argv),
    )
    deep_index_probe._ensure_index(d, 500, 5, 5)
    assert len(calls) == 1
    argv = calls[0]
    i = argv.index("--sigma")
    assert argv[i + 1] == "1.0"
    assert "500" in argv and "--workdir" in argv


def test_reclaimed_substrate_refuses_conflicting_flags(tmp_path, monkeypatch):
    """Index absent + meta disagreeing with the flags: refuse — a
    rebuild under wrong flags would put a different index under a name
    with measured history."""
    d = str(tmp_path / "sub2")
    os.makedirs(d)
    _stamp(d, num_trees=50)
    monkeypatch.setattr(
        deep_index_probe.subprocess, "run",
        lambda *a, **kw: pytest.fail("must not rebuild"),
    )
    with pytest.raises(SystemExit, match="measured history"):
        deep_index_probe._ensure_index(d, 500, 5, 5)


def test_present_substrate_refuses_mislabeling_flags(tmp_path):
    """Index present + meta present: flags that disagree with the
    recorded build are refused before any probe leg runs."""
    d = str(tmp_path / "sub3")
    os.makedirs(os.path.join(d, "idx", "nodes"))
    _stamp(d, n=1000)
    with pytest.raises(SystemExit, match="mislabeled"):
        deep_index_probe._ensure_index(d, 500, 5, 5)
    # matching flags pass silently
    deep_index_probe._ensure_index(d, 1000, 5, 5)


def test_gaussian_meta_rebuild_flag(tmp_path, monkeypatch):
    d = str(tmp_path / "sub4")
    os.makedirs(d)
    _stamp(d, gaussian=True, sigma=None)
    calls = []
    monkeypatch.setattr(
        deep_index_probe.subprocess, "run",
        lambda argv, **kw: calls.append(argv),
    )
    deep_index_probe._ensure_index(d, 500, 5, 5)
    assert "--gaussian" in calls[0] and "--sigma" not in calls[0]
