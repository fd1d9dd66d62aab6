#!/bin/bash
# CPU-scale training-quality A/B: tiny DENSE (PillarFeatureNet+scatter) vs
# tiny SPARSE (VFE-V3 + SpMiddleFHD) at matched budget on synthetic scan
# scenes, official KITTI AP on held-out frames. Purpose: localize the
# hardware-scale fhd-vs-PointPillars 3D-AP gap (VERDICT r3 item 3) to either
# the sparse PATH (tiny sparse lags too) or the RECIPE/SCALE (tiny matches).
# CPU-only; safe to run while the TPU claim is wedged.
set -ux
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
STEPS=${STEPS:-600}
DS=${DS:-64}
OUT=/tmp/ab
mkdir -p $OUT

python - <<'EOF'
from second_tpu import testing
with open('/tmp/ab/tiny_dense.config', 'w') as f:
    f.write(testing.TINY_PIPELINE)
with open('/tmp/ab/tiny_sparse.config', 'w') as f:
    f.write(testing.TINY_SPARSE_PIPELINE)
EOF

# voxel caps sized to the scan scenes (no truncation: the tiny configs'
# 1024/2048 caps overflow on scan geometry — 728 dropped voxels at eval
# biased the first A/B against dense)
CAP_dense=4096
CAP_sparse=8192

for kind in dense sparse; do
  cap=$(eval echo \$CAP_$kind)
  rm -rf $OUT/m_$kind
  python -m second_tpu.train.run train \
    --config_path $OUT/tiny_$kind.config --model_dir $OUT/m_$kind \
    --synthetic --dataset_size $DS --steps $STEPS \
    --patchs "train_config.steps_per_eval=0" \
    --patchs "train_input_reader.max_number_of_voxels=$cap" \
    --patchs "eval_input_reader.max_number_of_voxels=$cap" \
    > $OUT/train_$kind.log 2>&1
  python -m second_tpu.train.run evaluate \
    --config_path $OUT/tiny_$kind.config --model_dir $OUT/m_$kind \
    --synthetic --dataset_size $DS --max_frames 32 \
    --patchs "eval_input_reader.max_number_of_voxels=$cap" \
    > $OUT/eval_$kind.log 2>&1
  echo "=== $kind ==="
  grep -aE "AP|3d|bev|bbox" $OUT/eval_$kind.log | tail -12
done
