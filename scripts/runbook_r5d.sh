#!/bin/bash
# Round-5 runbook part D: tap-apply / gather-rank A/Bs + stage-composite
# attribution on the final round-5 code. Serial TPU work; never kill a
# step. DEADLINE guard: no NEW leg starts after DEADLINE_EPOCH (default
# 22:10 UTC today) so the chip is free well before the driver's
# end-of-round bench. Decisive A/B legs FIRST (base ~14.26 is known from
# r5a); bench_base2 only re-lands the default after refactors.
set -x
cd /root/repo
mkdir -p /tmp/rb5
S="bash scripts/rb_summarize_r5.sh"
DEADLINE=${DEADLINE_EPOCH:-$(date -u -d "22:10" +%s)}
ok() { [ "$(date -u +%s)" -lt "$DEADLINE" ]; }

# 1. gather-rank + tap-apply combined — the candidate shipping config.
#    Only ~one leg fits before the deadline, so run the decision-maker
#    first: if this beats base (14.26), both defaults flip and the
#    driver's end-of-round bench reuses this leg's compile cache.
ok && { SECOND_TPU_GATHER_RANK=1 SECOND_TPU_TAP_APPLY=1 \
  python bench.py > /tmp/rb5/bench_gr_tap.log 2>&1; $S; }

# 2. the tap-apply candidate alone (attribution says faster at s0/s1)
ok && { SECOND_TPU_TAP_APPLY=1 python bench.py > /tmp/rb5/bench_tapapply.log 2>&1; $S; }

# 3. gather-rank alone
ok && { SECOND_TPU_GATHER_RANK=1 python bench.py > /tmp/rb5/bench_gatherrank.log 2>&1; $S; }

# 4. re-land base on current code (default path refactors since r5a)
ok && { python bench.py > /tmp/rb5/bench_base2.log 2>&1; $S; }

# 5. refresh per-segment attribution on DEFAULT flags (the r5b leg ran
#    under the retired idx-map flag and is misleading)
ok && { BENCH_MAX_VOXELS=40000 python scripts/bench_fhd_stages.py \
  > /tmp/rb5/segments_40k.log 2>&1; $S; }

# 6. stage-composite timing (locates the unattributed middle time)
ok && { BENCH_ITERS=10 python scripts/bench_middle_stages.py \
  > /tmp/rb5/middle_stages.log 2>&1; $S; }

echo "runbook_r5d done $(date -u +%FT%TZ)" >> /tmp/rb5/done_d.marker
