"""Binary STL reading + exact mesh mass properties.

The reference humanoid (``assets/mujoco_models/humanoid_smpl_neutral_mesh*.xml``)
uses ``inertiafromgeom="true"`` with per-body STL mesh geoms and MuJoCo's
default density of 1000 kg/m^3; body masses and inertias therefore come from
exact volume integrals over the (watertight) meshes. We reproduce that with
the classic signed-tetrahedron decomposition.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


def read_stl(path) -> tuple[np.ndarray, np.ndarray]:
    """Read a binary STL file -> (verts (V, 3), faces (F, 3) int32).

    Vertices are deduplicated by exact bit pattern.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:5] == b"solid" and b"facet" in data[:200]:
        return _read_ascii_stl(data)
    from kinpoly_tpu.utils import native

    fast = native.parse_stl(data)
    if fast is not None:
        return fast
    (ntri,) = struct.unpack_from("<I", data, 80)
    rec = np.frombuffer(data, dtype=np.uint8, count=ntri * 50, offset=84)
    rec = rec.reshape(ntri, 50)
    tri = rec[:, 12:48].copy().view("<f4").reshape(ntri, 3, 3).astype(np.float64)
    flat = tri.reshape(-1, 3)
    uniq, inv = np.unique(flat.view([("x", "f8"), ("y", "f8"), ("z", "f8")]), return_inverse=True)
    verts = uniq.view("f8").reshape(-1, 3)
    faces = inv.reshape(-1, 3).astype(np.int32)
    return verts, faces


def _read_ascii_stl(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    verts = []
    for line in data.decode("ascii", "ignore").splitlines():
        line = line.strip()
        if line.startswith("vertex"):
            verts.append([float(x) for x in line.split()[1:4]])
    tri = np.asarray(verts, dtype=np.float64).reshape(-1, 3, 3)
    flat = tri.reshape(-1, 3)
    uniq, inv = np.unique(flat.view([("x", "f8"), ("y", "f8"), ("z", "f8")]), return_inverse=True)
    return uniq.view("f8").reshape(-1, 3), inv.reshape(-1, 3).astype(np.int32)


def write_stl(path, verts: np.ndarray, faces: np.ndarray) -> None:
    """Write a binary STL (used to materialise the MuJoCo-3 oracle model)."""
    tri = verts[faces]  # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)
    f = faces.shape[0]
    buf = bytearray(84 + 50 * f)
    struct.pack_into("<I", buf, 80, f)
    rec = np.zeros((f, 50), dtype=np.uint8)
    payload = np.concatenate([n[:, None, :], tri], axis=1).astype("<f4").reshape(f, 48 // 4)
    rec[:, :48] = payload.view(np.uint8).reshape(f, 48)
    buf[84:] = rec.tobytes()
    with open(path, "wb") as fh:
        fh.write(buf)


@dataclass(frozen=True)
class MassProperties:
    mass: float
    com: np.ndarray       # (3,)
    inertia: np.ndarray   # (3, 3) about the CoM, same axes as the vertices


def mesh_mass_properties(verts: np.ndarray, faces: np.ndarray, density: float = 1000.0) -> MassProperties:
    """Exact mass/CoM/inertia of a watertight triangle mesh via signed
    tetrahedra against the origin (what MuJoCo's legacy ``inertiafromgeom``
    computes for mesh geoms)."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    d = np.einsum("ij,ij->i", a, np.cross(b, c))  # 6 * signed tet volume

    vol = d.sum() / 6.0
    com = (d[:, None] * (a + b + c)).sum(axis=0) / 24.0 / vol

    # second moments about origin: C_ij = rho * \int x_i x_j dV
    def sec(i, j):
        s = (
            2.0 * (a[:, i] * a[:, j] + b[:, i] * b[:, j] + c[:, i] * c[:, j])
            + a[:, i] * b[:, j] + a[:, j] * b[:, i]
            + a[:, i] * c[:, j] + a[:, j] * c[:, i]
            + b[:, i] * c[:, j] + b[:, j] * c[:, i]
        )
        return (d * s).sum() / 120.0

    C = np.array([[sec(i, j) for j in range(3)] for i in range(3)]) * density
    mass = vol * density
    I_origin = np.eye(3) * np.trace(C) - C
    # parallel-axis shift to CoM
    r = com
    I_com = I_origin - mass * (np.eye(3) * (r @ r) - np.outer(r, r))
    return MassProperties(mass=float(mass), com=com, inertia=I_com)
