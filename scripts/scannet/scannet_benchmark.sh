#!/bin/bash
# Reference scripts/scannet/scannet_benchmark.sh: train on train+val and
# export benchmark-format predictions for the hidden test set.
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
  data.datasets.train_dataset.mode=train_validation \
  general.export=true \
  general.resume=True \
  ${EXTRA_ARGS}
