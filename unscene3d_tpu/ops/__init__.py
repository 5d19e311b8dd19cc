from unscene3d_tpu.ops.hashing import ravel_hash, sparse_quantize
from unscene3d_tpu.ops.kernel_maps import (
    KERNEL3_OFFSETS,
    KERNEL2_OFFSETS,
    build_neighbor_map,
    build_downsample_map,
    build_sparse_graph,
)
from unscene3d_tpu.ops.sparse_graph import LevelGraph, SparseGraph
