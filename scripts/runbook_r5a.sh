#!/bin/bash
# Round-5 perf runbook (quick legs only). Serial TPU work; never kill any
# step — each is bounded by its own iteration counts. Summarizes into
# RB_RESULTS_r5.md after EVERY leg so a wedge cannot zero the round.
set -x
cd /root/repo
mkdir -p /tmp/rb5
S="bash scripts/rb_summarize_r5.sh"

# 1. Baseline re-land (headline number on current code)
python bench.py > /tmp/rb5/bench_base.log 2>&1; $S

# 2. A/B the dense-rank rulebook path (stages>=1, then all stages)
SECOND_TPU_DENSE_RANK_CELLS=16000000 python bench.py > /tmp/rb5/bench_dense16M.log 2>&1; $S
SECOND_TPU_DENSE_RANK_CELLS=100000000 python bench.py > /tmp/rb5/bench_dense100M.log 2>&1; $S

# 3. A/B the approx-top_k predict prefilter
SECOND_TPU_APPROX_TOPK=1 python bench.py > /tmp/rb5/bench_approxtopk.log 2>&1; $S

# 4. batch-8 throughput (amortizes ~30 ms tunnel RTT per call)
BENCH_BATCH=8 python bench.py > /tmp/rb5/bench_b8.log 2>&1; $S

# 5. combined best-candidate flags
SECOND_TPU_DENSE_RANK_CELLS=16000000 SECOND_TPU_APPROX_TOPK=1 \
  python bench.py > /tmp/rb5/bench_combo.log 2>&1; $S

# 6. per-segment attribution at the honest 40k eval capacity
BENCH_MAX_VOXELS=40000 python scripts/bench_fhd_stages.py \
  > /tmp/rb5/segments_40k.log 2>&1; $S

# 7. training step-time probe (sizes the quality legs in runbook_r5b)
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_probe --synthetic --dataset_size 128 --steps 60 \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  > /tmp/rb5/probe_train.log 2>&1; $S

echo "runbook_r5a done $(date -u +%FT%TZ)" >> /tmp/rb5/done_a.marker
