"""Minimal OpenFOAM ASCII FoamFile reader/writer utilities.

Host-side only (never on the device hot path).  Supports the subset of
the OpenFOAM file format needed for polyMesh I/O: comment stripping,
FoamFile headers, scalar/label/vector lists and the boundary dictionary.
This replaces the reference's reliance on the OpenFOAM ``IOobject``
machinery (reference src/smoothMesh.C:1786-1820, 2416-2431) with a
standalone implementation.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np

_COMMENT_RE = re.compile(r"//[^\n]*|/\*.*?\*/", re.DOTALL)


def _parse_floats(s: str) -> np.ndarray:
    """Whitespace-separated floats -> float64 array (fast path fromstring)."""
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            return np.fromstring(s, dtype=np.float64, sep=" ")
    except Exception:
        return np.array(s.split(), dtype=np.float64)


def strip_comments(text: str) -> str:
    return _COMMENT_RE.sub(" ", text)


def _strip_header(text: str) -> str:
    """Remove the FoamFile { ... } header block, return the body."""
    m = re.search(r"FoamFile\s*\{", text)
    if m is None:
        return text
    depth = 1
    i = m.end()
    while depth > 0 and i < len(text):
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    return text[:m.start()] + text[i:]


def read_header(path: str) -> Dict[str, str]:
    with open(path, "r") as f:
        text = strip_comments(f.read(65536))
    m = re.search(r"FoamFile\s*\{(.*?)\}", text, re.DOTALL)
    hdr: Dict[str, str] = {}
    if m:
        for line in m.group(1).split(";"):
            parts = line.split(None, 1)
            if len(parts) == 2:
                hdr[parts[0].strip()] = parts[1].strip()
    return hdr


def load_body(path: str) -> str:
    with open(path, "r") as f:
        text = f.read()
    hdr = read_header(path)
    if hdr.get("format", "ascii") == "binary":
        raise NotImplementedError(
            f"binary FoamFile not supported: {path} (re-export as ascii)"
        )
    return _strip_header(strip_comments(text))


def parse_scalar_field(body: str) -> np.ndarray:
    """Parse ``N ( v v v ... )`` into a float64 array."""
    lp = body.index("(")
    rp = body.rindex(")")
    vals = _parse_floats(body[lp + 1: rp])
    return vals


def parse_label_list(body: str) -> np.ndarray:
    lp = body.index("(")
    rp = body.rindex(")")
    return _parse_floats(body[lp + 1: rp]).astype(
        np.int64
    )


def parse_vector_field(body: str) -> np.ndarray:
    """Parse ``N ( (x y z) (x y z) ... )`` into an (N, 3) float64 array."""
    lp = body.index("(")
    rp = body.rindex(")")
    inner = body[lp + 1: rp].replace("(", " ").replace(")", " ")
    vals = _parse_floats(inner)
    if vals.size % 3 != 0:
        raise ValueError("vector field token count not divisible by 3")
    return vals.reshape(-1, 3)


def parse_face_list(body: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse ``N ( k(a b ..) k(a b ..) ... )`` into (flat, offsets).

    ``flat`` concatenates all face point labels; ``offsets`` has length
    N+1 with face i occupying ``flat[offsets[i]:offsets[i+1]]``.
    """
    lp = body.index("(")
    rp = body.rindex(")")
    n_faces = int(body[:lp].split()[-1])
    inner = body[lp + 1: rp].replace("(", " ").replace(")", " ")
    toks = _parse_floats(inner).astype(np.int64)
    # Tokens are [count, p0..p_{count-1}] repeated.  Fast path: uniform
    # face size (hex/tet meshes) — detect by checking the implied stride.
    if n_faces > 0 and toks.size % n_faces == 0:
        stride = toks.size // n_faces
        cand = toks.reshape(n_faces, stride)
        if np.all(cand[:, 0] == stride - 1):
            flat = cand[:, 1:].reshape(-1).copy()
            offsets = np.arange(n_faces + 1, dtype=np.int64) * (stride - 1)
            return flat, offsets
    # General (mixed-size) path.
    counts = np.empty(n_faces, dtype=np.int64)
    pos = 0
    starts = np.empty(n_faces, dtype=np.int64)
    for i in range(n_faces):
        counts[i] = toks[pos]
        starts[i] = pos + 1
        pos += toks[pos] + 1
    if pos != toks.size:
        raise ValueError("face list parse error: trailing tokens")
    offsets = np.zeros(n_faces + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = np.empty(offsets[-1], dtype=np.int64)
    for i in range(n_faces):
        flat[offsets[i]: offsets[i + 1]] = toks[starts[i]: starts[i] + counts[i]]
    return flat, offsets


_DICT_ENTRY_RE = re.compile(r"(\S+)\s*\{([^{}]*)\}", re.DOTALL)


def parse_boundary(body: str) -> List[Dict[str, str]]:
    """Parse the polyMesh ``boundary`` file into a list of patch dicts."""
    lp = body.index("(")
    rp = body.rindex(")")
    inner = body[lp + 1: rp]
    patches = []
    for m in _DICT_ENTRY_RE.finditer(inner):
        name = m.group(1)
        entries: Dict[str, str] = {"name": name}
        for line in m.group(2).split(";"):
            parts = line.split(None, 1)
            if len(parts) == 2:
                entries[parts[0].strip()] = parts[1].strip()
        patches.append(entries)
    return patches


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

_HEADER = """\
/*--------------------------------*- C++ -*----------------------------------*\\
| Generated by smoothmesh_tpu                                                 |
\\*---------------------------------------------------------------------------*/
FoamFile
{{
    version     2.0;
    format      ascii;
    class       {cls};
    location    "{location}";
    object      {obj};
}}
// * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * //

"""


def _open_out(path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return open(path, "w")


def write_vector_field(path: str, cls: str, obj: str, location: str,
                       data: np.ndarray, precision: int = 10) -> None:
    """Write an (N, 3) array as ``N ( (x y z) ... )``.

    Points are written with >=10 significant digits, matching the
    reference's precision bump (reference src/smoothMesh.C:2425).
    """
    with _open_out(path) as f:
        f.write(_HEADER.format(cls=cls, obj=obj, location=location))
        f.write(f"{len(data)}\n(\n")
        fmt = f"({{:.{precision}g}} {{:.{precision}g}} {{:.{precision}g}})\n"
        f.write("".join(fmt.format(*row) for row in np.asarray(data)))
        f.write(")\n\n// ************************* //\n")


def write_label_list(path: str, cls: str, obj: str, location: str,
                     data: np.ndarray, note: str = "") -> None:
    with _open_out(path) as f:
        hdr = _HEADER.format(cls=cls, obj=obj, location=location)
        if note:
            hdr = hdr.replace("    object", f'    note        "{note}";\n    object')
        f.write(hdr)
        f.write(f"{len(data)}\n(\n")
        f.write("\n".join(str(int(v)) for v in np.asarray(data)))
        f.write("\n)\n\n// ************************* //\n")


def write_face_list(path: str, cls: str, obj: str, location: str,
                    flat: np.ndarray, offsets: np.ndarray) -> None:
    with _open_out(path) as f:
        f.write(_HEADER.format(cls=cls, obj=obj, location=location))
        n = len(offsets) - 1
        f.write(f"{n}\n(\n")
        flat = np.asarray(flat)
        offsets = np.asarray(offsets)
        lines = []
        for i in range(n):
            pts = flat[offsets[i]: offsets[i + 1]]
            lines.append(f"{len(pts)}({' '.join(str(int(p)) for p in pts)})")
        f.write("\n".join(lines))
        f.write("\n)\n\n// ************************* //\n")


def write_boundary(path: str, location: str,
                   patches: List[Dict[str, str]]) -> None:
    with _open_out(path) as f:
        f.write(_HEADER.format(cls="polyBoundaryMesh", obj="boundary",
                               location=location))
        f.write(f"{len(patches)}\n(\n")
        for p in patches:
            f.write(f"    {p['name']}\n    {{\n")
            for k in ("type", "inGroups", "nFaces", "startFace"):
                if k in p:
                    f.write(f"        {k}            {p[k]};\n")
            f.write("    }\n")
        f.write(")\n\n// ************************* //\n")
