#!/bin/bash
# Reference scripts/eval/eval_all_datasets.sh: evaluate a checkpoint across
# every processed dataset variant (oracle + pseudo datasets).
export CKPT=$1
export EXTRA_ARGS=$2

for DS in scannet_freemask_oracle unscene3d_csc unscene3d_dino unscene3d_dino_csc; do
  python main_instance_segmentation.py \
    general.experiment_name="eval_${DS}" \
    general.project_name="unscene3d" \
    general.checkpoint=${CKPT} \
    general.train_mode=false \
    general.eval_on_segments=true \
    general.train_on_segments=true \
    general.num_targets=3 \
    data/datasets=freemask \
    general.data_dir=data/processed/${DS} \
    ${EXTRA_ARGS}
done
