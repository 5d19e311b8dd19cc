"""UnScene3D-TPU: a TPU-native (JAX/XLA/Pallas) framework for fully unsupervised
3D instance segmentation, with the capabilities of RozDavid/UnScene3D.

Built TPU-first:
  * MinkowskiEngine's dynamic sparse-conv runtime is replaced by a static
    gather-GEMM engine driven by host-precomputed neighbor maps
    (`unscene3d_tpu.ops`): all shapes are bucketed/padded so every train step
    hits the same XLA executable.
  * CUDA atomics (tri-plane projection, 2D->3D feature projection) become
    deterministic segment-sums / z-buffer reductions in XLA.
  * The per-scene NCut loop's eigensolves run as batched padded
    `jnp.linalg.eigh` on device.
  * Data parallelism is a `jax.sharding.Mesh` + `shard_map` with `pmean`
    collectives (reference: pytorch-lightning DDP + NCCL all_reduce).
"""

__version__ = "0.1.0"
