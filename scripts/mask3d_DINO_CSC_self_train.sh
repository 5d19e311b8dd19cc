#!/bin/bash
# Full self-training cycle (reference scripts/mask3d_DINO_CSC_self_train.sh):
# round 1 at 601 epochs, rounds 2-4 at 70 epochs / lr 5e-5, each consuming
# the previous round's exported freemasks.
set -e
self_train_base_path=${SELF_TRAIN_BASE:-data/self_train}
name="DINO_CSC_self_train"

. scripts/unsupervised/train_unscene3d.sh "${name}" ""
python main_instance_segmentation.py general.train_mode=false \
  general.experiment_name=${name} general.save_for_freemask=true \
  general.filter_out_instances=true general.eval_on_segments=true \
  general.num_targets=3 data/datasets=freemask
mkdir -p ${self_train_base_path} && cp -r saved/${name} ${self_train_base_path}/${name}

for round in 2 3 4; do
  prev=$((round - 1))
  prev_name=${name}$( [ ${prev} -gt 1 ] && echo "_${prev}" )
  . scripts/unsupervised/train_unscene3d.sh "${name}_${round}" \
    "trainer.max_epochs=70 optimizer=adamw_lower \
     data.datasets.train_dataset.self_train_data_dir=${self_train_base_path}/${prev_name} \
     data.datasets.train_dataset.load_self_train_data=true \
     general.checkpoint=${self_train_base_path}/${prev_name}/best"
  python main_instance_segmentation.py general.train_mode=false \
    general.experiment_name=${name}_${round} general.save_for_freemask=true \
    general.filter_out_instances=true general.num_targets=3 data/datasets=freemask
  cp -r saved/${name}_${round} ${self_train_base_path}/${name}_${round}
done
