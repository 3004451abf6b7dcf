#!/bin/bash
# Full-registry DuckDB-oracle sweep in driver-window-sized chunks.
#
# The 325-query registry exceeds one command window at sf0.1, so the
# sweep runs scripts/selfcheck.py over ~65-name slices in REGISTRY
# order (slice 1 therefore covers the entire 50-name driver window).
#
# Usage: scripts/sweep_all.sh [sf_dir] [logfile]
#   sf_dir  default /root/testdata/sf0.01 (the driver's scale)
#   logfile default /tmp/klss_sweep_<sf>.log
# Prints the per-chunk pass/fail summary lines; exit 1 on any FAIL.
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
LOG="${2:-/tmp/klss_sweep_$(basename "$SF").log}"
: > "$LOG"
NAMES=$(python -c "import sys; sys.path.insert(0,'.'); import __spark_entry__ as m; print(' '.join(m.queries()))")
set -- $NAMES
TOTAL=$#
CHUNK=65
I=0
while [ $# -gt 0 ]; do
    BATCH=""
    N=0
    while [ $# -gt 0 ] && [ $N -lt $CHUNK ]; do
        BATCH="$BATCH $1"; shift; N=$((N+1))
    done
    I=$((I+1))
    echo "== chunk $I" >> "$LOG"
    python scripts/selfcheck.py "$SF" $BATCH 2>/dev/null \
        | grep -E "PASS|FAIL|ROWS|pass," >> "$LOG"
done
echo "== sweep done ($TOTAL names)" >> "$LOG"
grep -E "pass,|== sweep" "$LOG"
! grep -q FAIL "$LOG"
