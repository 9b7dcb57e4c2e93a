"""Host->device staging of compiled topology.

Converts a :class:`~smoothmesh_tpu.mesh.topology.MeshTopology` into a
flat dict of ``jnp`` arrays (the "device topology") consumed by the
kernels in :mod:`smoothmesh_tpu.ops` and :mod:`smoothmesh_tpu.geometry`.
Keeping it a plain dict of arrays makes it a pytree that can be donated,
sharded with ``jax.device_put`` + NamedSharding, or closed over by jit.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from smoothmesh_tpu.mesh.topology import MeshTopology


#: Host-packed face-angle tables: each replaces 2-3 separate staged
#: arrays read by ops.constraints.restrict_face_angle_deterioration,
#: cutting both resident HBM (~1.2 GB at the 10M-cell scale) and the
#: kernel's per-chunk gather rows (one gather instead of 2-3).
FA_PACKED_KEYS = frozenset({
    "ecf_packed", "fps_signed", "pps_signed", "pe_flat"})


def _fa_packed(topo: MeshTopology) -> Dict[str, np.ndarray]:
    """Build the packed face-angle tables on host (numpy).

    - ``ecf_packed``: edge_cell_f0 | f1 << sb | valid << 2*sb (the same
      packing the kernel previously did on device every call)
    - ``fps_signed`` / ``pps_signed``: face/point neighbour ids with
      the validity mask folded in as -1
    - ``pe_flat``: point_edges_side * E + point_edges with invalid
      slots as -1 (E = the edges array's padded row count, matching the
      kernel's flat det-buffer indexing)
    """
    wf = topo.edge_faces.shape[1]
    sb = max(wf, 1).bit_length()
    ecf = (topo.edge_cell_f0.astype(np.int32)
           + (topo.edge_cell_f1.astype(np.int32) << sb)
           + (topo.edge_cells_mask.astype(np.int32) << (2 * sb)))
    fps = np.where(topo.face_mask, topo.face_points, -1).astype(np.int32)
    pps = np.where(topo.point_points_mask,
                   topo.point_points, -1).astype(np.int32)
    e_rows = topo.edges.shape[0]
    if 2 * e_rows >= 2**31:  # flat (side, edge) ids must fit int32
        raise ValueError("mesh too large for int32 flat edge ids")
    pef = np.where(topo.point_edges_mask,
                   topo.point_edges_side.astype(np.int64) * e_rows
                   + topo.point_edges, -1).astype(np.int32)
    return {"ecf_packed": ecf, "fps_signed": fps, "pps_signed": pps,
            "pe_flat": pef}


def to_device(topo: MeshTopology, keys=None,
              fa_packed: bool = True) -> Dict[str, jnp.ndarray]:
    """Stage topology arrays (int32 indices, bool masks) on device.

    ``keys``: optional iterable restricting which arrays are staged.
    The default tile-engine iteration (driver.iteration_body_planar)
    reads only the face-angle fixed point's tables
    (driver.PLANAR_TD_KEYS) — staging just those halves the device
    topology footprint and the host->device upload, which at the
    BASELINE 10M-cell scale is gigabytes over a ~45 MB/s tunnel.

    ``fa_packed=False`` skips the packed face-angle tables in the full
    dict for consumers that never run the face-angle kernel (e.g. the
    quality report) — they cost host packing time plus ~1.2 GB of
    duplicate device memory at the 10M-cell scale (ADVICE r4).
    """
    if keys is None or "face_is_real_boundary" in keys:
        real_patch = np.array(
            [t not in ("processor", "empty") for t in topo.patch_types],
            dtype=bool)
        face_is_real_boundary = np.zeros(topo.n_faces, dtype=bool)
        bnd = topo.face_patch >= 0
        face_is_real_boundary[bnd] = real_patch[topo.face_patch[bnd]]
    else:
        face_is_real_boundary = None

    host = {
        "face_points": topo.face_points,
        "face_points_next": topo.face_points_next,
        "face_mask": topo.face_mask,
        "face_npoints": topo.face_npoints,
        "owner": topo.owner,
        "neighbour": topo.neighbour,
        "has_neighbour": topo.has_neighbour,
        "edges": topo.edges,
        "edge_faces": topo.edge_faces,
        "edge_faces_mask": topo.edge_faces_mask,
        "edge_cells": topo.edge_cells,
        "edge_cells_mask": topo.edge_cells_mask,
        "edge_cell_f0": topo.edge_cell_f0,
        "edge_cell_f1": topo.edge_cell_f1,
        "point_points": topo.point_points,
        "point_points_mask": topo.point_points_mask,
        "point_cells": topo.point_cells,
        "point_cells_mask": topo.point_cells_mask,
        "point_faces": topo.point_faces,
        "point_faces_mask": topo.point_faces_mask,
        "point_edges": topo.point_edges,
        "point_edges_mask": topo.point_edges_mask,
        "point_edges_side": topo.point_edges_side,
        "wedge_prev": topo.wedge_prev,
        "wedge_next": topo.wedge_next,
        "cell_faces": topo.cell_faces,
        "cell_faces_mask": topo.cell_faces_mask,
        "is_internal_point": topo.is_internal_point,
        "face_patch": topo.face_patch,
        "face_is_real_boundary": face_is_real_boundary,
        # Row-validity masks: all True for a plain mesh; padded rows in
        # sharded stacked topologies are False (see parallel.partition).
        # Entity-padded topologies (parallel.halo.pad_topology) attach
        # explicit *_valid_rows attributes.
        "point_valid": getattr(topo, "point_valid_rows", None)
        if getattr(topo, "point_valid_rows", None) is not None
        else np.ones(topo.n_points, dtype=bool),
        "edge_valid": getattr(topo, "edge_valid_rows", None)
        if getattr(topo, "edge_valid_rows", None) is not None
        else np.ones(topo.n_edges, dtype=bool),
        "cell_valid": getattr(topo, "cell_valid_rows", None)
        if getattr(topo, "cell_valid_rows", None) is not None
        else np.ones(topo.n_cells, dtype=bool),
    }
    if keys is None:
        # full dict: packed forms ride along (the face-angle kernel
        # prefers them; legacy keys stay for the other consumers)
        if fa_packed:
            host.update(_fa_packed(topo))
    else:
        host = {k: v for k, v in host.items() if k in keys}
        wanted = FA_PACKED_KEYS & set(keys)
        if wanted:
            pk = _fa_packed(topo)
            host.update({k: pk[k] for k in wanted})
    return {k: jnp.asarray(v) for k, v in host.items()}
