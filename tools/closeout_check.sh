#!/bin/bash
# Closeout FRESHNESS check (VERDICT r11 #5): the gate's claim is
# "artifacts postdate the last commit touching package source" — ANY
# source commit, doc-only or not (r11 landed a docstring-only commit
# two hours after the closeout artifacts; no behavior change, but
# doc-only-after-closeout is the exception that erodes the gate).
#
# Run as the FINAL act of the round (after the artifact commit):
#   bash tools/closeout_check.sh
# Exits non-zero if any commit touching rust_vector_search_spark/,
# __spark_entry__.py, bench.py, or tools/*.py postdates the newest
# closeout artifact commit (EXPLAINS.md / CORRECTNESS_LOCAL.json).
set -euo pipefail
cd "$(dirname "$0")/.."

src_ts=$(git log -1 --format=%ct -- rust_vector_search_spark \
         __spark_entry__.py bench.py 'tools/*.py')
art_ts=$(git log -1 --format=%ct -- EXPLAINS.md CORRECTNESS_LOCAL.json)

if [[ -z "$art_ts" ]]; then
    echo "closeout_check: no committed closeout artifacts found" >&2
    exit 1
fi
if (( src_ts > art_ts )); then
    echo "closeout_check: FAIL — a source commit postdates the closeout" >&2
    echo "  last source commit:   $(git log -1 --format='%h %ci %s' -- \
        rust_vector_search_spark __spark_entry__.py bench.py 'tools/*.py')" >&2
    echo "  last artifact commit: $(git log -1 --format='%h %ci %s' -- \
        EXPLAINS.md CORRECTNESS_LOCAL.json)" >&2
    echo "  re-run tools/closeout.sh and re-commit the artifacts" >&2
    exit 1
fi
echo "closeout_check: OK — closeout artifacts postdate the last source commit"
