"""Host-side kernel-map builder: the MinkowskiEngine coordinate-manager
replacement.

For each batch we build, once, on the host:
  * per-level kernel-size-3 neighbor maps (output-centric: for every voxel and
    every one of the 27 offsets, the index of the input voxel at that offset),
  * stride-2 parent/child maps shared by strided convs, transposed convs and
    AvgPooling (MinkowskiEngine generates these coords identically for
    `conv(k=2,s=2)` / `conv_tr(k=2,s=2)` / `MinkowskiAvgPooling(k=2,s=2)`,
    which the reference relies on in models/mask3d.py:205-216,429-436).

A vectorized numpy implementation is provided here; `unscene3d_tpu.native`
offers a C++ flat-hash implementation for the hot path with identical output.
"""

from __future__ import annotations

import itertools

import numpy as np

from unscene3d_tpu.ops.hashing import CoordHashTable, ravel_hash
from unscene3d_tpu.ops.sparse_graph import LevelGraph, SparseGraph, bucket_size

# Offset orderings (dx, dy, dz), z fastest. For kernel_size=3 the center
# (0,0,0) sits at index 13. Weight-layout converters from MinkowskiEngine
# checkpoints must permute into this order.
KERNEL3_OFFSETS = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int32
)  # (27, 3)
KERNEL2_OFFSETS = np.array(
    list(itertools.product((0, 1), repeat=3)), dtype=np.int32
)  # (8, 3); offset id = dx*4 + dy*2 + dz


def build_neighbor_map(coords: np.ndarray, use_native: bool = True
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Output-centric kernel-size-3 map.

    coords: (N, 4) int [b, x, y, z] unit coords (no padding rows).
    Returns (nbr_idx (27, N) int32, nbr_valid (27, N) bool): for voxel i and
    offset k, the index of the voxel at coords[i] + offset[k] if present.

    Uses the C++ flat-hash builder (unscene3d_tpu/native/kernel_maps.cpp)
    when available; numpy sorted-key searchsorted otherwise.
    """
    if use_native:
        from unscene3d_tpu.native import build_neighbor_map_native

        res = build_neighbor_map_native(np.asarray(coords, np.int32), KERNEL3_OFFSETS)
        if res is not None:
            return res
    n = len(coords)
    table = CoordHashTable(coords)
    nbr_idx = np.zeros((27, n), dtype=np.int32)
    nbr_valid = np.zeros((27, n), dtype=bool)
    query = coords.astype(np.int64).copy()
    for k, off in enumerate(KERNEL3_OFFSETS):
        query[:, 1:] = coords[:, 1:] + off
        idx, found = table.lookup(query)
        nbr_idx[k] = np.where(found, idx, 0).astype(np.int32)
        nbr_valid[k] = found
    return nbr_idx, nbr_valid


def build_neighbor_map_padded(coords: np.ndarray, n_pad: int) -> np.ndarray:
    """Kernel-size-3 map emitted straight in its padded (27, n_pad) layout:
    misses and the padding tail point at row n_pad-1 (always a padding row
    under the bucketing contract, see _pad_level). Fuses the map build with
    the sentinel pass -- the separate masked pad2 copy cost ~80ms/level on
    the 200k bench scene."""
    from unscene3d_tpu.native import build_neighbor_map_padded_native

    coords = np.asarray(coords, np.int32)
    assert n_pad > len(coords)
    out = build_neighbor_map_padded_native(coords, KERNEL3_OFFSETS,
                                           int(n_pad), int(n_pad - 1))
    if out is not None:
        return out
    idx, valid = build_neighbor_map(coords)
    n = len(coords)
    out = np.empty((27, n_pad), np.int32)
    out[:, n:] = n_pad - 1
    out[:, :n] = np.where(valid, idx, np.int32(n_pad - 1))
    return out


def build_downsample_map(
    coords: np.ndarray,
    with_child: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stride-2 (kernel_size=2) downsample topology.

    coords: (N, 4) unit coords at the fine level.
    Returns:
      coarse_coords: (M, 4) unique floor(coords/2) (sorted-key order)
      parent_idx:    (N,) index of each fine voxel's coarse parent
      parent_offset: (N,) kernel offset id in [0, 8)
      child_idx:     (8, M) fine index of each coarse voxel's child per offset
      child_valid:   (8, M)

    with_child=False skips the child arrays (returned as (8, 0)):
    build_sparse_graph derives the padded child map with one scatter from
    the parent maps instead, so building them here would be dead work.
    """
    coords = np.asarray(coords, dtype=np.int64)
    parents = coords.copy()
    parents[:, 1:] >>= 1  # arithmetic shift == floor division
    keys = ravel_hash(parents)
    _, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)
    coarse_coords = parents[first_idx].astype(np.int32)
    m = len(first_idx)
    off = (
        (coords[:, 1] & 1) * 4 + (coords[:, 2] & 1) * 2 + (coords[:, 3] & 1)
    ).astype(np.int32)
    if with_child:
        child_idx = np.zeros((8, m), dtype=np.int32)
        child_valid = np.zeros((8, m), dtype=bool)
        child_idx[off, inverse] = np.arange(len(coords), dtype=np.int32)
        child_valid[off, inverse] = True
    else:
        child_idx = np.zeros((8, 0), dtype=np.int32)
        child_valid = np.zeros((8, 0), dtype=bool)
    return (
        coarse_coords,
        inverse.astype(np.int32),
        off,
        child_idx,
        child_valid,
    )


def _pad_level(
    coords: np.ndarray,
    nbr_idx: np.ndarray,
    nbr_valid: np.ndarray,
    child_idx: np.ndarray,
    child_valid: np.ndarray,
    parent_idx: np.ndarray,
    parent_offset: np.ndarray,
    n_pad: int,
    finer_n_pad: int,
    coarser_n_pad: int,
    stub_nbr: bool = False,
    nbr_prepadded: np.ndarray | None = None,
    child_prepadded: np.ndarray | None = None,
) -> LevelGraph:
    """Missing/padded map entries point at the respective level's LAST row,
    which bucketing guarantees to be padding -- validity is then derivable on
    device (LevelGraph.nbr_valid/child_valid properties) and the bool masks
    never cross the host->device link.

    nbr_prepadded/child_prepadded: maps already in their padded sentinel
    layout (build_neighbor_map_padded / the parent-scatter child build in
    build_sparse_graph); the masked pad2 copies are skipped for those."""
    n = len(coords)
    assert n_pad > n, "bucketing must leave at least one padding row"

    def pad2(idx, valid, fill):
        out = np.empty((idx.shape[0], n_pad), dtype=np.int32)
        out[:, n:] = fill
        out[:, :n] = np.where(valid, idx.astype(np.int32, copy=False),
                              np.int32(fill))
        return out

    coords_p = np.zeros((n_pad, 4), dtype=np.int32)
    coords_p[:n] = coords
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    parent_idx_p = np.full(n_pad, max(coarser_n_pad - 1, 0), dtype=np.int32)
    parent_idx_p[:n] = parent_idx
    parent_off_p = np.zeros(n_pad, dtype=np.int32)
    parent_off_p[:n] = parent_offset
    if stub_nbr:
        nbr_p = np.full((27, 1), n_pad - 1, np.int32)
    elif nbr_prepadded is not None:
        assert nbr_prepadded.shape == (27, n_pad)
        nbr_p = nbr_prepadded
    else:
        nbr_p = pad2(nbr_idx, nbr_valid, n_pad - 1)
    if child_prepadded is not None:
        assert child_prepadded.shape == (8, n_pad)
        child_p = child_prepadded
    else:
        child_p = pad2(child_idx, child_valid, max(finer_n_pad - 1, 0))
    return LevelGraph(
        coords=coords_p,
        valid=valid,
        nbr_idx=nbr_p,
        child_idx=child_p,
        parent_idx=parent_idx_p,
        parent_offset=parent_off_p,
        finer_num_padded=finer_n_pad,
    )


def build_down_neighbor_map(coarse_coords: np.ndarray, fine_coords: np.ndarray
                            ) -> tuple[np.ndarray, np.ndarray]:
    """kernel_size=3 STRIDE-2 map: for each coarse voxel c, the fine voxel at
    2*c + offset for the 27 offsets (MinkUNet-style strided stage convs)."""
    table = CoordHashTable(fine_coords)
    n = len(coarse_coords)
    idx = np.zeros((27, n), dtype=np.int32)
    valid = np.zeros((27, n), dtype=bool)
    query = np.asarray(coarse_coords, np.int64).copy()
    base = query.copy()
    base[:, 1:] *= 2
    for k, off in enumerate(KERNEL3_OFFSETS):
        query[:, 1:] = base[:, 1:] + off
        i, f = table.lookup(query)
        idx[k] = np.where(f, i, 0).astype(np.int32)
        valid[k] = f
    return idx, valid


def _win_spill_plan(v):
    """Normalize a plan entry to (table_rows, slice_len) or None."""
    if isinstance(v, (list, tuple)):
        p8, q = int(v[0]), int(v[1])
    else:
        p8 = q = int(v or 0)
    return (p8, q) if (p8 or q) else None


def build_sparse_graph(
    coords: np.ndarray,
    num_levels: int = 5,
    pad_sizes: list[int] | None = None,
    build_nbr_maps: bool = True,
    brick_levels: tuple = (),
    brick_pads: list[int] | None = None,
    build_down_nbr_maps: bool = False,
    fine_buckets: bool = False,
    csr_levels: tuple = (),
    csr_pbs: list | None = None,
    win_levels: tuple = (),
    win_spills: list | None = None,
    win_spills_down: list | None = None,
    win_spills_up: list | None = None,
    win_w_sub: int | tuple = 384,
    win_w_union: int = 4096,
    win_group: int = 8,
    win_tile: int = 256,
) -> SparseGraph:
    """Build the full multi-level topology for one collated batch.

    coords: (N, 4) int [batch, x, y, z] voxel coords at stride 1 (unpadded).
    pad_sizes: optional explicit per-level padded sizes; defaults to
      `bucket_size` of each level's voxel count.
    build_nbr_maps: skip the (more expensive) k3 maps when only pooling
      topology is needed.
    brick_levels: levels whose k3 convs run in dense-brick mode
      (ops/bricks.py); their 27-way neighbor maps are skipped entirely.
    """
    coords = np.asarray(coords, dtype=np.int64)
    level_coords = [coords]
    parent_idxs, parent_offs = [], []
    for _ in range(num_levels - 1):
        coarse, p_idx, p_off, _, _ = build_downsample_map(
            level_coords[-1], with_child=False)
        level_coords.append(coarse.astype(np.int64))
        parent_idxs.append(p_idx)
        parent_offs.append(p_off)

    pads = [
        pad_sizes[li] if pad_sizes is not None
        else bucket_size(len(level_coords[li]) + 1, fine=fine_buckets,
                         # the CSR kernel tiles out rows in 256 blocks; win
                         # grouping amortizes one union DMA over win_group
                         # tiles of win_tile rows, so pads align to G*tile
                         align=max(256 if li in csr_levels else 128,
                                   win_tile * win_group
                                   if li in win_levels else 128))
        for li in range(num_levels)
    ]
    levels = []
    for li in range(num_levels):
        lc = level_coords[li].astype(np.int32)
        n = len(lc)
        nbr_pre = None
        if build_nbr_maps and li not in brick_levels:
            nbr_pre = build_neighbor_map_padded(lc, pads[li])
        # child map straight in its padded layout from the parent maps: each
        # fine voxel i is its parent's unique (offset-id) child, so ONE
        # scatter over the fine rows replaces build_downsample_map's child
        # arrays + the masked pad2 copy (exact same result; equality-tested
        # in tests/test_native.py)
        if li == 0:
            c_pre = np.zeros((8, pads[0]), dtype=np.int32)
        else:
            n_fine = len(level_coords[li - 1])
            c_pre = np.full((8, pads[li]), pads[li - 1] - 1, dtype=np.int32)
            c_pre[parent_offs[li - 1][:n_fine],
                  parent_idxs[li - 1][:n_fine]] = np.arange(
                      n_fine, dtype=np.int32)
        if li == num_levels - 1:
            p_idx = np.zeros(n, dtype=np.int32)
            p_off = np.zeros(n, dtype=np.int32)
        else:
            p_idx, p_off = parent_idxs[li], parent_offs[li]
        lvl = _pad_level(
            lc, None, None, None, None, p_idx, p_off,
            n_pad=pads[li],
            finer_n_pad=pads[li - 1] if li > 0 else 1,
            coarser_n_pad=pads[li + 1] if li < num_levels - 1 else 1,
            stub_nbr=(li in brick_levels or not build_nbr_maps),
            nbr_prepadded=nbr_pre,
            child_prepadded=c_pre,
        )
        if li in brick_levels:
            from unscene3d_tpu.ops.bricks import build_brick_map

            lvl = lvl.replace(brick=build_brick_map(
                np.asarray(lvl.coords), np.asarray(lvl.valid),
                nb_pad=brick_pads[li] if brick_pads else None,
            ))
        if li in csr_levels:
            from unscene3d_tpu.ops.csr_conv import build_csr_graph

            lvl = lvl.replace(csr=build_csr_graph(
                np.asarray(lvl.nbr_idx), pads[li],
                pb=(csr_pbs[li] or None) if csr_pbs else None,
            ))
        if li in win_levels and pads[li] >= 2 * win_tile:
            from unscene3d_tpu.ops.window_conv import (
                SpillPlanExceeded,
                build_win_graph,
            )
            from unscene3d_tpu.ops.window_gather import (
                build_win_tables,
                up_tables_from_parents,
            )

            def _rekey(exc: SpillPlanExceeded, kind: str, level: int):
                """Re-raise with the pad-plan key + level so the trainer's
                plan rebuild can apply the realized floor (VERDICT r4
                next#2)."""
                val = exc.needed.get("win_spill", exc.needed.get("win_spill_k"))
                raise SpillPlanExceeded(
                    f"level {level} {kind}: {exc}",
                    needed={kind: {level: val}}) from exc

            # largest group <= win_group whose G*tile tiling divides the pad
            # (master pad plans may carry pads aligned only to 256)
            g = win_group
            while g > 1 and pads[li] % (win_tile * g):
                g //= 2
            try:
                lvl = lvl.replace(win=build_win_graph(
                    np.asarray(lvl.nbr_idx), pads[li],
                    w_sub=win_w_sub,     # int or per-region (W_own, W_dx);
                    #                      build_win_graph clamps to the pad
                    w_union=win_w_union + (g - 1) * win_tile,
                    # plan value is (compact table rows, per-tile slice len)
                    spill_plan=_win_spill_plan(win_spills[li])
                    if win_spills else None,
                    group=g, tile=win_tile,
                ))
            except SpillPlanExceeded as e:
                _rekey(e, "win_spill", li)
            if li > 0:
                try:
                    lvl = lvl.replace(win_down=build_win_tables(
                        np.asarray(lvl.child_idx), pads[li], pads[li - 1],
                        spill_pad=(win_spills_down[li] or None)
                        if win_spills_down else None,
                    ))
                except SpillPlanExceeded as e:
                    _rekey(e, "win_spill_down", li)
            if li < num_levels - 1:
                nv = len(level_coords[li])
                vmask = np.zeros(pads[li], bool)
                vmask[:nv] = True
                try:
                    lvl = lvl.replace(win_up=build_win_tables(
                        up_tables_from_parents(
                            np.asarray(lvl.parent_idx),
                            np.asarray(lvl.parent_offset), vmask,
                            pads[li + 1]),
                        pads[li], pads[li + 1],
                        spill_pad=(win_spills_up[li] or None)
                        if win_spills_up else None,
                    ))
                except SpillPlanExceeded as e:
                    _rekey(e, "win_spill_up", li)
        if build_down_nbr_maps and li > 0:
            d_idx, d_valid = build_down_neighbor_map(lc, level_coords[li - 1])
            fill = pads[li - 1] - 1
            dn = np.full((27, pads[li]), fill, np.int32)
            dn[:, :n] = np.where(d_valid, d_idx, fill)
            lvl = lvl.replace(down_nbr_idx=dn)
        else:
            lvl = lvl.replace(down_nbr_idx=np.full((27, 1), max(pads[li - 1] - 1, 0) if li > 0 else 0, np.int32))
        levels.append(lvl)
    return SparseGraph(levels=tuple(levels))
