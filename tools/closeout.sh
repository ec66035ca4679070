#!/bin/bash
# Round closeout gate, IN ORDER (VERDICT r9 #6: artifacts must postdate
# the last functional commit — r8 and r9 both shipped EXPLAINS.md /
# CORRECTNESS_LOCAL.json captured minutes before a late functional
# commit, leaving cosmetically-stale evidence for the judge).
#
# Run AFTER the final functional commit of the round:
#   bash tools/closeout.sh [sf_dir]
#
# Order and why:
#   1. full pytest            — the suite gates everything after it
#   2. rehearse_window        — the 50 driver-window queries in ONE
#                               vanilla 1 GB session (rows are the gate)
#   3. bench.py at sf0.1      — solo clean-band run (repeat 2-3x by
#                               hand; single runs drift ±10%)
#   4. gen_explains           — plan captures of the SHIPPED code
#   5. run_correctness        — CORRECTNESS_LOCAL.json over the FULL
#                               registry on the SHIPPED code
# Steps 4/5 come last precisely so their timestamps postdate every
# functional change; if ANY step fails, fix, re-commit, and re-run the
# whole gate.
#
# The gate's claim covers ANY later source commit, doc-only included
# (VERDICT r11 #5: a docstring-only commit landed after the r11
# artifacts and eroded the claim). After committing the regenerated
# artifacts, run tools/closeout_check.sh as the round's FINAL act — it
# fails if any commit touching package source postdates the artifact
# commit.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"

echo "=== closeout 1/5: pytest ==="
python -m pytest tests/ -q

echo "=== closeout 2/5: driver-window rehearsal (vanilla 1 GB) ==="
python tools/rehearse_window.py "$SF_DIR"

echo "=== closeout 3/5: bench at sf0.1 (+ drift adjudication) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py \
    | tee /tmp/closeout_bench.json
# family-ratio drift check (VERDICT r14 #3): adjudicate every >1.3x
# per-query move against its family's calibration row and land the
# verdict block in ROUND_NOTES.md automatically
python tools/drift_check.py /tmp/closeout_bench.json

echo "=== closeout 4/5: EXPLAINS.md ==="
python tools/gen_explains.py

echo "=== closeout 5/5: CORRECTNESS_LOCAL.json ==="
python tools/run_correctness.py "$SF_DIR"

echo "=== closeout complete — commit the regenerated artifacts ==="
