"""tools/drift_check.py (VERDICT r14 #3): the family-ratio drift
adjudicator must call ENVIRONMENT when a row's family calibration moved
with it, CODE-SUSPECT when the calibration held, and UNCALIBRATED when
there is no calibration history — never silently treating a missing
sample as "held". No Spark needed."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "drift_check.py")


def _run(tmp_path, fresh: dict, prev: dict) -> str:
    f = tmp_path / "fresh.json"
    p = tmp_path / "prev.json"
    f.write_text(json.dumps(fresh))
    p.write_text(json.dumps(prev))
    out = subprocess.run(
        [sys.executable, TOOL, str(f), "--prev", str(p), "--no-notes"],
        capture_output=True, text=True, check=True,
    )
    return out.stdout


def test_environment_vs_code_suspect_vs_uncalibrated(tmp_path):
    prev = {
        "queries": {
            "multimodal_jpeg_features": 1.0,
            "pagerank_customer_supplier": 1.0,
            "q1_pricing_summary": 1.0,
            "dedup_minhash_lsh_pairs": 1.0,
        },
        "arrow_calibration_sec": 0.30,
        "jvm_calibration_sec": 0.50,
    }
    fresh = {
        "queries": {
            # arrow row moved WITH its calibration → environment
            "multimodal_jpeg_features": 1.6,
            # jvm row moved while jvm calibration held → code-suspect
            "pagerank_customer_supplier": 1.6,
            # within threshold → not reported
            "q1_pricing_summary": 1.2,
            # new-row case exercised below
            "dedup_minhash_lsh_pairs": 1.0,
        },
        "arrow_calibration_sec": 0.50,
        "jvm_calibration_sec": 0.52,
    }
    out = _run(tmp_path, fresh, prev)
    assert "multimodal_jpeg_features: 1.60x — environment" in out
    assert "pagerank_customer_supplier: 1.60x — CODE-SUSPECT" in out
    assert "q1_pricing_summary" not in out
    assert "1 code-suspect / 2 moved" in out


def test_missing_calibration_is_uncalibrated_and_wrapper_shape(tmp_path):
    # prev in the DRIVER-ARTIFACT wrapper shape ({"parsed": {...}}),
    # with no jvm calibration sample (the r14 artifacts predate it)
    prev = {
        "parsed": {
            "queries": {"pagerank_customer_supplier": 1.0},
            "arrow_calibration_sec": 0.30,
        }
    }
    fresh = {
        "queries": {"pagerank_customer_supplier": 2.0},
        "arrow_calibration_sec": 0.31,
        "jvm_calibration_sec": 0.50,
    }
    out = _run(tmp_path, fresh, prev)
    assert "UNCALIBRATED" in out
    assert "0 code-suspect / 1 moved" in out


def test_all_within_band(tmp_path):
    prev = {"queries": {"q1_pricing_summary": 1.0},
            "arrow_calibration_sec": 0.3, "jvm_calibration_sec": 0.5}
    fresh = {"queries": {"q1_pricing_summary": 1.05},
             "arrow_calibration_sec": 0.3, "jvm_calibration_sec": 0.5}
    out = _run(tmp_path, fresh, prev)
    assert "all rows within" in out
