#!/usr/bin/env python3
"""Family-ratio bench drift check (VERDICT r14 #3): adjudicate
round-over-round per-query wall moves against the two calibration rows
so "did the environment move, or did my code?" is answered by the
artifact instead of by manual solo runs (the r13 jpeg and r14
dedup_embedding/pagerank episodes each burned a session on that call).

Usage (closeout wires this in):
    python tools/drift_check.py FRESH_BENCH_JSON [--prev PREV.json]
                                [--no-notes]

FRESH_BENCH_JSON is a file whose LAST line is bench.py's one-line JSON
(tee'd by tools/closeout.sh). --prev defaults to the highest-numbered
BENCH_r*.json in the repo root — the prior round's driver artifact.

Rule: a query row "moves" when fresh/prev wall ratio leaves
[1/1.3, 1.3]. Each row is adjudicated against its FAMILY calibration:
  - arrow family (mapInPandas modality rows: multimodal_*) against
    arrow_calibration_sec;
  - every other row (JVM-side plans) against jvm_calibration_sec.
If the family calibration moved the same direction past 1.3x, the
verdict is ENVIRONMENT; if the calibration held its band, the verdict
is CODE-SUSPECT — go run `bench.py --only <row>` solo and read the
diff. Missing calibration samples (e.g. the first round after a row is
added) are reported as UNCALIBRATED, never silently treated as held.

The verdict block is appended to ROUND_NOTES.md (--no-notes for ad-hoc
runs) so the adjudication lands in the round's artifact trail
automatically.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTES = os.path.join(REPO, "ROUND_NOTES.md")
THRESH = 1.3

# mapInPandas modality rows — the family the Arrow calibration row was
# built for (r13 jpeg lesson). Everything else in the headline set is
# JVM-side (built-in functions; the forest rows' Arrow stages are
# warm-started and dominated by JVM joins, and their drift has matched
# the JVM family in practice).
ARROW_FAMILY_PAT = re.compile(r"^multimodal_")


def _load_last_json(path: str) -> dict:
    """Accept both shapes: the driver's BENCH_r{N}.json artifact (a
    wrapper dict whose 'parsed' field holds bench.py's output) and a
    raw/tee'd log whose LAST {...} line is bench.py's one-liner."""
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if isinstance(doc.get("parsed"), dict):
                return doc["parsed"]
            if "queries" in doc:
                return doc
    except json.JSONDecodeError:
        pass
    last = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            last = line
    if last is None:
        raise SystemExit(f"drift_check: no JSON line found in {path}")
    return json.loads(last)


def _default_prev() -> "str | None":
    benches = []
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            benches.append((int(m.group(1)), p))
    return max(benches)[1] if benches else None


def _ratio(fresh: "float | None", prev: "float | None") -> "float | None":
    if not fresh or not prev or prev <= 0:
        return None
    return fresh / prev


def main() -> None:
    argv = sys.argv[1:]
    notes = True
    if "--no-notes" in argv:
        notes = False
        argv.remove("--no-notes")
    prev_path = None
    if "--prev" in argv:
        i = argv.index("--prev")
        prev_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 1:
        raise SystemExit(
            "usage: drift_check.py FRESH_BENCH_JSON [--prev P] [--no-notes]"
        )
    fresh = _load_last_json(argv[0])
    prev_path = prev_path or _default_prev()
    if prev_path is None:
        raise SystemExit("drift_check: no BENCH_r*.json to compare against")
    prev = _load_last_json(prev_path)

    cal_ratio = {
        "arrow": _ratio(
            fresh.get("arrow_calibration_sec"),
            prev.get("arrow_calibration_sec"),
        ),
        "jvm": _ratio(
            fresh.get("jvm_calibration_sec"), prev.get("jvm_calibration_sec")
        ),
    }

    lines = [
        f"drift check vs {os.path.basename(prev_path)} "
        f"(threshold {THRESH}x):",
        "  calibration: "
        + ", ".join(
            f"{fam} {r:.2f}x" if r is not None else f"{fam} (no prior sample)"
            for fam, r in cal_ratio.items()
        ),
    ]
    suspects = []
    moved = []
    for name, wall in sorted(fresh.get("queries", {}).items()):
        r = _ratio(wall, prev.get("queries", {}).get(name))
        if r is None:
            continue  # new row this round — nothing to compare
        if 1 / THRESH <= r <= THRESH:
            continue
        fam = "arrow" if ARROW_FAMILY_PAT.match(name) else "jvm"
        cr = cal_ratio[fam]
        if cr is None:
            verdict = f"UNCALIBRATED ({fam} row, no calibration history)"
        elif (r > 1 and cr > THRESH) or (r < 1 and cr < 1 / THRESH):
            verdict = f"environment ({fam} calibration moved {cr:.2f}x too)"
        else:
            verdict = (
                f"CODE-SUSPECT ({fam} calibration held at {cr:.2f}x) — "
                f"solo-run `bench.py --only {name}` and read the diff"
            )
            suspects.append(name)
        moved.append(name)
        lines.append(f"  {name}: {r:.2f}x — {verdict}")
    if not moved:
        lines.append(f"  all rows within {THRESH}x of the prior round")
    lines.append(
        f"  verdict: {len(suspects)} code-suspect / {len(moved)} moved"
    )

    block = "\n".join(lines)
    print(block)
    if notes:
        with open(NOTES, "a") as f:
            f.write(
                "\n## Automated bench drift check (tools/drift_check.py)\n\n"
            )
            f.write("```\n" + block + "\n```\n")
        print(f"(appended to {NOTES})")
    sys.exit(0)


if __name__ == "__main__":
    main()
