"""Minimal VTK legacy writer for frame output.

Reference: /root/reference/stark/extern/vtkio (header-only VTK legacy writer,
VTKFile.h). ASCII legacy format is sufficient for visualization parity.
"""
from __future__ import annotations

import numpy as np

_CELL_TYPES = {"points": 1, "segments": 3, "triangles": 5, "tets": 10}


def write_vtk(path: str, vertices, conn, kind: str):
    vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    conn = np.asarray(conn, dtype=np.int64)
    if conn.ndim == 1:
        conn = conn.reshape(-1, 1)
    n_cells, k = conn.shape
    ct = _CELL_TYPES[kind]
    # fast path: native binary legacy writer (native/stark_native.cc, the
    # analog of the reference's C++ vtkio); ASCII below is the fallback
    from ..native import write_vtk_binary

    if write_vtk_binary(path, vertices, conn, ct):
        return
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nstark_tpu frame\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(vertices)} double\n")
        for v in vertices:
            f.write(f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
        f.write(f"CELLS {n_cells} {n_cells * (k + 1)}\n")
        for c in conn:
            f.write(f"{k} " + " ".join(str(int(i)) for i in c) + "\n")
        f.write(f"CELL_TYPES {n_cells}\n")
        for _ in range(n_cells):
            f.write(f"{ct}\n")


def read_vtk(path: str):
    """Read back a legacy unstructured grid (vertices, conn), ASCII or BINARY."""
    with open(path, "rb") as f:
        raw = f.read()
    if b"\nBINARY\n" in raw[:64]:
        return _read_vtk_binary(raw)
    lines = raw.decode().split("\n")
    i = 0
    verts = []
    cells = []
    while i < len(lines):
        line = lines[i]
        if line.startswith("POINTS"):
            n = int(line.split()[1])
            vals = []
            i += 1
            while len(vals) < 3 * n:
                vals += [float(x) for x in lines[i].split()]
                i += 1
            verts = np.asarray(vals).reshape(n, 3)
            continue
        if line.startswith("CELLS"):
            n = int(line.split()[1])
            for j in range(n):
                i += 1
                parts = [int(x) for x in lines[i].split()]
                cells.append(parts[1:])
        i += 1
    return np.asarray(verts), np.asarray(cells, dtype=np.int64)


def _read_vtk_binary(raw: bytes):
    """Parse the native writer's binary legacy layout (big-endian payloads)."""
    pos = raw.index(b"POINTS")
    hdr_end = raw.index(b"\n", pos)
    n_pts = int(raw[pos:hdr_end].split()[1])
    start = hdr_end + 1
    verts = np.frombuffer(raw, dtype=">f8", count=3 * n_pts,
                          offset=start).reshape(n_pts, 3).astype(np.float64)
    pos = raw.index(b"CELLS", start)
    hdr_end = raw.index(b"\n", pos)
    parts = raw[pos:hdr_end].split()
    n_cells, n_ints = int(parts[1]), int(parts[2])
    start = hdr_end + 1
    flat = np.frombuffer(raw, dtype=">i4", count=n_ints, offset=start)
    arity = int(flat[0])
    cells = flat.reshape(n_cells, arity + 1)[:, 1:].astype(np.int64)
    return verts, cells
