from unscene3d_tpu.utils.runtime import enable_compilation_cache, Timer
