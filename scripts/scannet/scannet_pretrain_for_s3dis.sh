#!/bin/bash
# Reference scripts/scannet/scannet_pretrain_for_s3dis.sh: ScanNet
# pretraining checkpoint for S3DIS fine-tuning.
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
  trainer.max_epochs=601 \
  general.resume=True \
  ${EXTRA_ARGS}
