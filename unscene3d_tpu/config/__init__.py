from unscene3d_tpu.config.loader import ConfigNode, instantiate, load_config
