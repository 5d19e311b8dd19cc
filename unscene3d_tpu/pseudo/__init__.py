from unscene3d_tpu.pseudo.ncut import NCutConfig, generate_scene_masks
