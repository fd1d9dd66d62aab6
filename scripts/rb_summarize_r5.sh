#!/bin/bash
# Collect round-5 runbook results from /tmp/rb5 into a repo file so chip
# results survive even if no session is watching when they land. Run after
# EVERY leg (cheap) so a wedge can never zero out the round.
OUT=/root/repo/RB_RESULTS_r5d.md
{
  echo "# Round-5 runbook part D results (updated $(date -u +%FT%TZ))"
  echo
  echo "## Bench legs (one JSON line each; fhd e2e fps, vs 20 fps baseline)"
  for f in /tmp/rb5/bench_*.log; do
    [ -f "$f" ] || continue
    echo "### $(basename "$f")"
    grep -a '"metric"' "$f" | tail -1
    echo
  done
  if [ -f /tmp/rb5/segments_40k.log ]; then
    echo "## Per-segment attribution (40k eval voxels)"
    tail -20 /tmp/rb5/segments_40k.log
    echo
  fi
  echo "## Training quality legs (official AP on held-out synthetic scans)"
  for f in /tmp/rb5/*_eval.log; do
    [ -f "$f" ] || continue
    echo "### $(basename "$f")"
    grep -aE 'Car AP|bbox AP|bev  AP|3d   AP' "$f" | tail -8
    grep -ao 'eval\.frames_per_sec[^ ]*' "$f" | tail -2
    echo
  done
  echo "## Per-dimension error decomposition (offline, from persisted annos)"
  for f in /tmp/rb5/diag_*.log; do
    [ -f "$f" ] || continue
    echo "### $(basename "$f")"
    grep -aA12 'matched .* pairs' "$f" | tail -16
    echo
  done
  echo "## Train-loop tails"
  for f in /tmp/rb5/*_train.log; do
    [ -f "$f" ] || continue
    echo "### $(basename "$f")"
    grep -a '^step=' "$f" | tail -2
    echo
  done
} > "$OUT"
echo "wrote $OUT"
