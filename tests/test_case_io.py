"""Case/time-directory handling and the CLI -parallel path."""

import numpy as np

from smoothmesh_tpu.io import write_polymesh
from smoothmesh_tpu.io.case import FoamCase
from smoothmesh_tpu.mesh.blockmesh import hex_block, perturb


def _make_case(root):
    (root / "system").mkdir(parents=True)
    (root / "system" / "controlDict").write_text("deltaT 0.5;\n")
    mesh = perturb(hex_block(n=(4, 4, 4)), 0.03, seed=9)
    write_polymesh(str(root / "constant" / "polyMesh"), mesh)
    return mesh


def test_time_selection_and_latest(tmp_path):
    mesh = _make_case(tmp_path)
    case = FoamCase(str(tmp_path))
    assert case.delta_t() == 0.5
    assert case.latest_time() == 0.0 or case.time_dirs() == []
    # write meshes at two times; latest wins
    case.write_mesh(mesh, mesh.points + 0.01, 1.0)
    case.write_mesh(mesh, mesh.points + 0.02, 2.5)
    assert case.latest_time() == 2.5
    back = case.read_mesh(case.latest_time())
    assert np.allclose(back.points, mesh.points + 0.02)
    # time-bounded selection picks the earlier instance
    back1 = case.read_mesh(1.2)
    assert np.allclose(back1.points, mesh.points + 0.01)


def test_label_io_list_roundtrip(tmp_path):
    mesh = _make_case(tmp_path)
    case = FoamCase(str(tmp_path))
    data = np.zeros(mesh.n_points, dtype=np.int64)
    data[3] = 1
    case.write_label_io_list("isCornerPoint", 1.0, data)
    back = case.read_label_io_list("isCornerPoint", 1.0, mesh.n_points)
    assert back is not None and np.array_equal(back, data)
    # missing file -> None
    assert case.read_label_io_list("nothere", 1.0, mesh.n_points) is None


def test_cli_parallel_end_to_end(tmp_path):
    _make_case(tmp_path)
    from smoothmesh_tpu.cli import main

    rc = main(["-case", str(tmp_path), "-centroidalIters", "5",
               "-parallel"])
    assert rc == 0
    case = FoamCase(str(tmp_path))
    assert case.latest_time() > 0
    out = case.read_mesh(case.latest_time())
    assert out.n_points == 125
