#!/bin/bash
# DINO+CSC pseudo-mask generation (reference pseudo_masks/scripts/unscene3d_dino_2d3d.sh).
python pseudo_masks_main.py \
  freemask.modality=both \
  freemask.affinity_tau=0.6 \
  data.segments_min_vert_nums=[50] \
  net.weights_for_inner_model=${CSC_WEIGHTS:-model_weights/CSC_train_Res16UNet34C_2cm.pth} \
  image_data.model_checkpoint=${DINO_WEIGHTS:-model_weights/dino_deitsmall8_pretrain.pth} \
  misc.save_dir=${SAVE_DIR:-outputs/unscene3d_dino_csc} \
  "$@"
