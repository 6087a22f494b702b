#!/bin/bash
# Interleaved A/B (note-57 protocol) for the note-105 fan-out: old = r11
# verdict checkout (.ab/r11, pre-317c902), new = /root/repo. 3 passes/side,
# alternating, fresh subprocess per pass. rep=100 = the 100x artifact grain.
set -u
REP="${1:-100}"
OUT=/tmp/ab_fanout_results.jsonl
: > "$OUT"
for i in 1 2 3; do
  for side in old new; do
    if [ "$side" = old ]; then PP=/root/.ab/r11; else PP=/root/repo; fi
    echo "pass $i side $side" >&2
    T=$(PYTHONPATH="$PP" python /root/repo/tools/ab_fanout_probe.py "$REP" 2>/dev/null | tail -1)
    echo "{\"pass\": $i, \"side\": \"$side\", \"result\": $T}" >> "$OUT"
  done
done
cat "$OUT"
