#!/bin/bash
# Round-5 runbook part C: the fhd quality rerun (VERDICT r4 item 2).
# The round-2 hardware gap (fhd 8.0 vs PP 36.7 3d@0.7 at 8k steps) was
# measured under the since-fixed biased z-truncation; this reruns the same
# budget with the hash-uniform truncation + sized caps, plus a no-truncation
# control, against a matched PointPillars leg. Summarizes after EVERY leg.
set -x
cd /root/repo
mkdir -p /tmp/rb5
S="bash scripts/rb_summarize_r5.sh"
STEPS=${FHD_STEPS:-8000}

# 1. fhd OneCycle at the r2 gap budget (16k train-voxel cap, hash-uniform cut)
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_oc8k --synthetic --dataset_size 128 --steps $STEPS \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  > /tmp/rb5/fhd8k_train.log 2>&1; $S
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_oc8k --synthetic --dataset_size 128 --max_frames 64 \
  > /tmp/rb5/fhd8k_eval.log 2>&1; $S

# 2. zero-truncation control (cap covers the whole ~21.5k-voxel scan cloud):
#    (1) drops a hash-uniform subset, (2) drops nothing.
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_nocap8k --synthetic --dataset_size 128 --steps $STEPS \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  --patchs "train_input_reader.max_number_of_voxels=26000" \
  > /tmp/rb5/fhdnocap8k_train.log 2>&1; $S
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/second_car_fhd_onecycle.config \
  --model_dir /tmp/fhd_nocap8k --synthetic --dataset_size 128 --max_frames 64 \
  > /tmp/rb5/fhdnocap8k_eval.log 2>&1; $S

# 3. matched PointPillars leg (its round-2 recipe)
python -m second_tpu.train.run train \
  --config_path second_tpu/configs/pointpillars_car.config \
  --model_dir /tmp/pp_oc5 --synthetic --dataset_size 128 --steps 1500 \
  --patchs "train_input_reader.batch_size=2" \
  --patchs "train_config.steps_per_eval=0" \
  --patchs "train_config.save_checkpoints_secs=420" \
  > /tmp/rb5/pp_train.log 2>&1; $S
python -m second_tpu.train.run evaluate \
  --config_path second_tpu/configs/pointpillars_car.config \
  --model_dir /tmp/pp_oc5 --synthetic --dataset_size 128 --max_frames 64 \
  > /tmp/rb5/pp_eval.log 2>&1; $S

# 4. offline per-dimension error decomposition on the persisted annos
for md in /tmp/fhd_oc8k /tmp/fhd_nocap8k /tmp/pp_oc5; do
  last=$(ls -d "$md"/eval_results/step_* 2>/dev/null | sort -V | tail -1)
  [ -n "$last" ] && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/diag_quality_gap.py --annos_dir "$last" \
    > /tmp/rb5/diag_$(basename "$md").log 2>&1
done
$S

echo "runbook_r5c done $(date -u +%FT%TZ)" >> /tmp/rb5/done_c.marker
