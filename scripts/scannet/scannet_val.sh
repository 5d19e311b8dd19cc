#!/bin/bash
# Reference scripts/scannet/scannet_val.sh: supervised ScanNet val training
# (Mask3D path on full labels, scannet dataset config).
export EXP_NAME=$1
export EXTRA_ARGS=$2

python main_instance_segmentation.py \
  general.experiment_name=${EXP_NAME} \
  general.eval_on_segments=true \
  general.train_on_segments=true \
  general.project_name="mask3d" \
  data/datasets=scannet \
  general.num_targets=19 \
  data.num_labels=20 \
  general.resume=True \
  ${EXTRA_ARGS}
