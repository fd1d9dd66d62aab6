#!/bin/bash
# Chip-return runbook: serial TPU work in priority order. Never kill any
# step — each is bounded by its own iteration counts.
set -x
cd /root/repo
mkdir -p /tmp/rb

# 1. Confirm current code benches (headline number; eval-loop RTT fixes in)
python bench.py > /tmp/rb/bench_base.log 2>&1

# 2. A/B the dense-rank rulebook path (stages>=1, then all stages)
SECOND_TPU_DENSE_RANK_CELLS=16000000 python bench.py > /tmp/rb/bench_dense16M.log 2>&1
SECOND_TPU_DENSE_RANK_CELLS=100000000 python bench.py > /tmp/rb/bench_dense100M.log 2>&1

# 2b. A/B the approx-top_k predict prefilter
SECOND_TPU_APPROX_TOPK=1 python bench.py > /tmp/rb/bench_approxtopk.log 2>&1

# 2c. batch-8 throughput (amortizes the ~30 ms tunnel RTT per call; if it
#     wins clearly, flip BATCH default in bench.py)
BENCH_BATCH=8 python bench.py > /tmp/rb/bench_b8.log 2>&1

# 2d. combined best-candidate flags (rulebook dense-rank + approx topk)
SECOND_TPU_DENSE_RANK_CELLS=16000000 SECOND_TPU_APPROX_TOPK=1 \
  python bench.py > /tmp/rb/bench_combo.log 2>&1

# 2e. per-segment attribution at the honest 40k eval capacity (judge asked
#     for per-segment numbers next to the headline fps)
BENCH_MAX_VOXELS=40000 python scripts/bench_fhd_stages.py \
  > /tmp/rb/segments_40k.log 2>&1

# 3. fhd OneCycle training (north-star accuracy experiment), resumable
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_oc2 --synthetic --dataset_size 128 --steps 2500 \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  > /tmp/rb/fhd_train.log 2>&1

# 3b. Zero-overflow control: same recipe with the train voxel cap raised to
#     cover the whole scan cloud (~21.5k voxels; r2 runs overflowed 16k by
#     ~5.1k/step). vs (3) this separates "any 24% random drop hurts" from
#     "the old z-biased cut was the damage" — (3) now drops a hash-uniform
#     subset, (3b) drops nothing.
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_oc_nocap --synthetic --dataset_size 128 --steps 2500 \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  --patchs "train_input_reader.max_number_of_voxels=26000" \
  > /tmp/rb/fhd_nocap_train.log 2>&1
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_oc_nocap --synthetic --dataset_size 128 --max_frames 64 \
  > /tmp/rb/fhd_nocap_eval.log 2>&1

# 4. Evaluate it (official AP on held-out synthetic scans) — also the
#    eval-throughput drill: check frames_per_sec_steady >= 20 in the log
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_oc2 --synthetic --dataset_size 128 --max_frames 64 \
  > /tmp/rb/fhd_eval.log 2>&1

# 5. PointPillars comparison at its round-2 recipe (1500 steps OneCycle)
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/pointpillars_car.config \
  --model_dir /tmp/pp_oc2 --synthetic --dataset_size 128 --steps 1500 \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  > /tmp/rb/pp_train.log 2>&1
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/pointpillars_car.config \
  --model_dir /tmp/pp_oc2 --synthetic --dataset_size 128 --max_frames 64 \
  > /tmp/rb/pp_eval.log 2>&1

# 6. fp32-middle control for the fhd quality gap: same recipe as (3) with
#    mixed precision OFF — discriminates bf16-localization loss from recipe.
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_fp32 --synthetic --dataset_size 128 --steps 2500 \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  --patchs "train_config.enable_mixed_precision=False" \
  > /tmp/rb/fhd_fp32_train.log 2>&1
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_fp32 --synthetic --dataset_size 128 --max_frames 64 \
  --patchs "train_config.enable_mixed_precision=False" \
  > /tmp/rb/fhd_fp32_eval.log 2>&1

# 7. Offline per-dim error decomposition on every eval's persisted annos
#    (result.pkl/gt.pkl written by evaluate since r4) — pins which box
#    dimensions fail at fhd scale without re-claiming the chip.
for md in /tmp/fhd_oc2 /tmp/fhd_oc_nocap /tmp/pp_oc2 /tmp/fhd_fp32; do
  last=$(ls -d "$md"/eval_results/step_* 2>/dev/null | sort -V | tail -1)
  [ -n "$last" ] && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/diag_quality_gap.py --annos_dir "$last" \
    > /tmp/rb/diag_$(basename "$md").log 2>&1
done

# 8. Summarize everything landed so far into the repo FIRST (the Pallas
#    legs below can hang the tunnel; don't let them doom earlier results)
bash scripts/rb_summarize.sh

# 9. Pallas kernel A/Bs — LAST and timeout-bounded: remote Pallas compile
#    has hung before, and killing a blocked tunnel call can re-wedge the
#    claim. 2400 s covers the ~10 min first-compile.
timeout 2400 env SECOND_TPU_PALLAS_GATHER=1 \
  python bench.py > /tmp/rb/bench_pallas_gather.log 2>&1
timeout 2400 env SECOND_TPU_PALLAS_SUBM=1 \
  python bench.py > /tmp/rb/bench_pallas_subm.log 2>&1
timeout 2400 env SECOND_TPU_PALLAS_GATHER=1 SECOND_TPU_PALLAS_SUBM=1 \
  python bench.py > /tmp/rb/bench_pallas_both.log 2>&1

# 10. Re-summarize with the Pallas legs included
bash scripts/rb_summarize.sh
