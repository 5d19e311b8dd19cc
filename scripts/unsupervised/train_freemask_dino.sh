#!/bin/bash
# Reference scripts/unsupervised/train_freemask_dino.sh
export EXP_NAME=$1
export EXTRA_ARGS=$2

DATA_DIR=${DATA_DIR:-data/processed/unscene3d_dino}
VAL_DATA_DIR=${VAL_DATA_DIR:-data/processed/scannet_freemask_oracle}

python main_instance_segmentation.py \
  general.experiment_name=${EXP_NAME} \
  general.project_name="unscene3d" \
  general.eval_on_segments=true \
  general.train_on_segments=true \
  general.num_targets=3 \
  data.batch_size=8 \
  data.test_batch_size=1 \
  data/collation_functions=freemask_voxelize_collate \
  data/datasets=freemask \
  general.data_dir=${DATA_DIR} \
  data.datasets.validation_dataset.data_dir=${VAL_DATA_DIR} \
  data.datasets.test_dataset.data_dir=${VAL_DATA_DIR} \  general.resume=True \
  ${EXTRA_ARGS}
