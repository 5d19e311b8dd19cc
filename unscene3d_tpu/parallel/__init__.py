from unscene3d_tpu.parallel.mesh import make_mesh, stack_shards
