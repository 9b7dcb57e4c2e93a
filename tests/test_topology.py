"""Mesh compiler tests against hand-countable structured meshes."""

import numpy as np

from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb
from smoothmesh_tpu.mesh.topology import compile_topology


def test_counts_2x2x2():
    m = hex_block(n=(2, 2, 2))
    assert (m.n_points, m.n_cells, m.n_faces, m.n_internal_faces) == (
        27, 8, 36, 12)
    t = compile_topology(m)
    assert t.n_edges == 54
    center = 13  # (1,1,1)
    assert t.point_cells_mask[center].sum() == 8
    assert t.point_points_mask[center].sum() == 6
    assert t.point_faces_mask[center].sum() == 12
    assert t.point_edges_mask[center].sum() == 6
    assert t.is_internal_point.sum() == 1 and t.is_internal_point[center]


def test_wedges_are_face_neighbours():
    m = hex_block(n=(2, 2, 2))
    t = compile_topology(m)
    # For every (point, face) incidence the wedge neighbours must be
    # members of that face and adjacent to the point in its perimeter.
    for p in range(t.n_points):
        for s in range(t.point_faces.shape[1]):
            if not t.point_faces_mask[p, s]:
                continue
            f = t.point_faces[p, s]
            perim = [t.face_points[f, k]
                     for k in range(t.face_points.shape[1])
                     if t.face_mask[f, k]]
            i = perim.index(p)
            n = len(perim)
            assert t.wedge_prev[p, s] == perim[(i - 1) % n]
            assert t.wedge_next[p, s] == perim[(i + 1) % n]


def test_edge_cell_face_pairs():
    m = hex_block(n=(3, 3, 3), grading=(2.0, 1.0, 0.5))
    t = compile_topology(m)
    # For each valid (edge, cell): the two recorded faces must belong to
    # the cell and contain the edge.
    E, WC = t.edge_cells.shape
    for e in range(0, E, 7):
        pts = set(t.edges[e])
        for c in range(WC):
            if not t.edge_cells_mask[e, c]:
                continue
            cell = t.edge_cells[e, c]
            for fslot in (t.edge_cell_f0[e, c], t.edge_cell_f1[e, c]):
                f = t.edge_faces[e, fslot]
                fpts = set(t.face_points[f][t.face_mask[f]])
                assert pts <= fpts
                assert t.owner[f] == cell or (
                    t.has_neighbour[f] and t.neighbour[f] == cell)
            assert t.edge_cell_f0[e, c] != t.edge_cell_f1[e, c]


def test_perturb_keeps_boundary():
    m = hex_block(n=(3, 3, 3))
    t = compile_topology(m)
    p = perturb(m, 0.05, seed=1)
    moved = np.any(p.points != m.points, axis=1)
    assert not np.any(moved & ~t.is_internal_point)
    assert np.all(moved[t.is_internal_point])


def test_patch_selectors():
    m = hex_block(n=(2, 2, 2),
                  patches={"walls": ["xmin", "xmax", "ymin", "ymax"],
                           "def_top": ["zmax"], "def_bot": ["zmin"]})
    t = compile_topology(m)
    assert t.patch_ids_matching(["def.*"]).tolist() == [1, 2]
    assert t.patch_ids_matching([".*"]).tolist() == [0, 1, 2]
    assert t.patch_ids_matching(["walls"]).tolist() == [0]


def test_native_and_numpy_paths_agree():
    from smoothmesh_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    m = hex_block(n=(3, 4, 2), grading=(2.0, 1.0, 1.0))
    a = compile_topology(m, use_native=True)
    b = compile_topology(m, use_native=False)
    assert a.n_edges == b.n_edges
    # same edge set (order may differ)
    assert set(map(tuple, a.edges.tolist())) == set(
        map(tuple, b.edges.tolist()))
    # same adjacency sets per row
    for name in ("point_cells", "cell_faces", "point_faces"):
        pa = getattr(a, name)
        ma = getattr(a, name + "_mask")
        pb = getattr(b, name)
        mb = getattr(b, name + "_mask")
        for r in range(pa.shape[0]):
            assert set(pa[r][ma[r]].tolist()) == set(pb[r][mb[r]].tolist())
    # wedges stay aligned with their faces
    for p in range(a.n_points):
        wa = {(int(a.point_faces[p, s]), int(a.wedge_prev[p, s]),
               int(a.wedge_next[p, s]))
              for s in range(a.point_faces.shape[1])
              if a.point_faces_mask[p, s]}
        wb = {(int(b.point_faces[p, s]), int(b.wedge_prev[p, s]),
               int(b.wedge_next[p, s]))
              for s in range(b.point_faces.shape[1])
              if b.point_faces_mask[p, s]}
        assert wa == wb
