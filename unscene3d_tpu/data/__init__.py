from unscene3d_tpu.data.batch import SceneBatch, Targets
