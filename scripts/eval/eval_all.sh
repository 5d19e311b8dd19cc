#!/usr/bin/env bash
# Between-rounds evaluation / freemask export driver (reference
# scripts/eval/eval_all.sh:1-49). Evaluates a trained checkpoint on the
# validation set and exports confident predictions as freemasks/ for the
# next self-training round.
#
# AP50 progression the reference reports with this flow (BASELINE.md):
#   CSC rounds 1-4:      0.180 / 0.241 / 0.258 / 0.265
#   DINO+CSC rounds 1-4: 0.234 / 0.298 / 0.319 / 0.321

set -e

eval_0="general.experiment_name=unscene3d_DINO_CSC_self_train_eval general.checkpoint=saved/unscene3d_DINO_CSC_self_train/checkpoints"

# Necessary params for standard evaluation
export EVAL_PARAMS="general.project_name=mask3d general.train_mode=false general.eval_on_segments=true data.test_batch_size=1 general.num_targets=3 data/datasets=freemask data/collation_functions=freemask_voxelize_collate logging=offline"
export DATA_PARAMS="data.test_dataset.data_dir=data/processed/unscene3d_dino_csc data.validation_dataset.data_dir=data/processed/scannet_freemask_oracle"

# Parameters if we want to export for self train
export PHASE="data.test_dataset.mode=train_validation"
export FREEMASK_PARAMS="general.filter_out_instances=true general.save_visualizations=false general.save_for_freemask=true"

python main_instance_segmentation.py ${EVAL_PARAMS} ${DATA_PARAMS} ${PHASE} ${FREEMASK_PARAMS} ${eval_0} "$@"
