#!/bin/bash
# Round-5 runbook part B: dense-index-map A/B + attribution, then the fhd
# quality rerun legs. Serial TPU work; never kill a step. Summarizes after
# EVERY leg.
set -x
cd /root/repo
mkdir -p /tmp/rb5
S="bash scripts/rb_summarize_r5.sh"

# 1. idx-map rulebook A/B at stage>=1 grids (<=12M cells), then all stages
SECOND_TPU_IDX_MAP_CELLS=16000000 python bench.py > /tmp/rb5/bench_idx16M.log 2>&1; $S
SECOND_TPU_IDX_MAP_CELLS=100000000 python bench.py > /tmp/rb5/bench_idx100M.log 2>&1; $S

# 2. per-piece attribution (window vs map build/apply, downsample sort)
python scripts/bench_idxmap_attrib.py > /tmp/rb5/idxmap_attrib.log 2>&1; $S

# 3. per-segment attribution at 40k under the better idx flag
SECOND_TPU_IDX_MAP_CELLS=16000000 BENCH_MAX_VOXELS=40000 \
  python scripts/bench_fhd_stages.py > /tmp/rb5/segments_40k.log 2>&1; $S

echo "runbook_r5b done $(date -u +%FT%TZ)" >> /tmp/rb5/done_b.marker
