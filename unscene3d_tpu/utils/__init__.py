from unscene3d_tpu.utils.runtime import Timer, enable_compilation_cache, init_on_cpu
