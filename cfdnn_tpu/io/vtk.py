"""VTK legacy output + text profiles.

TPU-native rebuild of the reference output layer (reference: src/
solver_vtk.cpp:15-109 write_vtk — STRUCTURED_POINTS, ASCII for 2D, big-endian
binary doubles for 3D; src/solver.cpp:3351 write_fields text profiles).
Format-compatible so the reference's postprocessing/spectral scripts read the
files unchanged. Device arrays are pulled to host NumPy once per snapshot —
the only host<->device transfer in a simulation campaign.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

# native C encoder (transpose+byteswap+interleave in one GIL-released pass,
# the analogue of the reference's C++ VTK layer); None => NumPy fallback.
# Loaded (and compiled, first time) lazily on the first binary write so
# importing the apps never pays the cc subprocess.
_vtkio_cache = []


def _native():
    if not _vtkio_cache:
        from ..native import load_vtkio
        _vtkio_cache.append(load_vtkio())
    return _vtkio_cache[0]


def _vel_centers(state, geom):
    """Velocity interpolated to cell centers (host-side numpy)."""
    from ..turbulence.base import cell_center_velocity
    return [np.asarray(c)
            for c in cell_center_velocity((state.u, state.v, state.w), geom)]


def write_vtk(path: str, state, mesh, geom, cfg,
              extra_scalars: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Write a legacy-VTK snapshot of (velocity, pressure, [nu_t, k, omega]).

    2D => ASCII; 3D => big-endian binary doubles when cfg.vtk_binary
    (reference write_vtk :45-109). STRUCTURED_POINTS uses the uniform
    spacing; stretched axes are written with mean spacing plus sidecars
    `<path>.ycoords.txt` / `.zcoords.txt` carrying the true centers.
    """
    u, v, w = _vel_centers(state, geom)
    p = np.asarray(state.p)
    Nx, Ny, Nz = mesh.Nx, mesh.Ny, mesh.Nz
    is2d = mesh.is_2d
    binary = bool(cfg.vtk_binary) and not is2d

    scalars = {"pressure": p}
    if state.nu_t is not None:
        scalars["nu_t"] = np.asarray(state.nu_t)
    if state.k is not None:
        scalars["k"] = np.asarray(state.k)
        scalars["omega"] = np.asarray(state.omega)
    if extra_scalars:
        scalars.update({k: np.asarray(a) for k, a in extra_scalars.items()})

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    dx = mesh.x.h
    # mean spacing on stretched axes (the true coordinates go in the
    # sidecars below); z.h would be the smallest wall-adjacent cell
    dy = float(np.mean(mesh.y.d))
    dz = float(np.mean(mesh.z.d)) if Nz > 1 else 1.0

    def c_order(a):
        # VTK iterates x fastest: transpose (i,j,k) -> (k,j,i) then ravel
        return np.ascontiguousarray(np.transpose(a, (2, 1, 0)))

    mode = "wb" if binary else "w"
    with open(path, mode) as fh:
        def line(s):
            fh.write(s.encode() if binary else s)

        line("# vtk DataFile Version 3.0\n")
        line("cfdnn_tpu simulation output\n")
        line("BINARY\n" if binary else "ASCII\n")
        line("DATASET STRUCTURED_POINTS\n")
        line(f"DIMENSIONS {Nx} {Ny} {Nz}\n")
        # ORIGIN is the domain corner while the data are cell-centered —
        # a half-cell shift inherited verbatim from the reference writer
        # (src/solver_vtk.cpp:87) so its postprocessing scripts read both
        # frameworks' files identically; the sidecars carry true centers.
        line(f"ORIGIN {mesh.x.lo} {mesh.y.lo} {mesh.z.lo}\n")
        line(f"SPACING {dx} {dy} {dz}\n")
        line(f"POINT_DATA {Nx * Ny * Nz}\n")

        f64c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
        _vtkio = _native() if binary else None

        line("VECTORS velocity double\n")
        if binary and _vtkio is not None:
            fh.write(_vtkio.encode_vectors(f64c(u), f64c(v), f64c(w),
                                           Nx, Ny, Nz))
        elif binary:
            vel = np.stack([c_order(u), c_order(v), c_order(w)], axis=-1)
            fh.write(vel.astype(">f8").tobytes())
        else:
            vel = np.stack([c_order(u), c_order(v), c_order(w)], axis=-1)
            np.savetxt(fh, vel.reshape(-1, 3), fmt="%.9g")

        for name, arr in scalars.items():
            line(f"\nSCALARS {name} double 1\n")
            line("LOOKUP_TABLE default\n")
            if binary and _vtkio is not None:
                fh.write(_vtkio.encode_scalar(f64c(arr), Nx, Ny, Nz))
            elif binary:
                fh.write(c_order(arr).reshape(-1).astype(">f8").tobytes())
            else:
                np.savetxt(fh, c_order(arr).reshape(-1), fmt="%.9g")

    if not mesh.y.uniform:
        np.savetxt(path + ".ycoords.txt", mesh.y.centers, fmt="%.16e")
    if not mesh.z.uniform:
        np.savetxt(path + ".zcoords.txt", mesh.z.centers, fmt="%.16e")


def _parse_dims(header: str) -> Tuple[int, int, int]:
    d = [int(x) for x in header.split("DIMENSIONS")[1].split("\n")[0].split()]
    return d[0], d[1], d[2]


def read_vtk_dims(path: str) -> Tuple[int, int, int]:
    """(Nx, Ny, Nz) from a STRUCTURED_POINTS header. Single source for
    DIMENSIONS parsing — read_vtk_scalars and the spectral-analysis CLI
    must agree on it. Reads only the header, not the data body."""
    header = b""
    with open(path, "rb") as fh:
        while b"POINT_DATA" not in header:
            chunk = fh.read(65536)
            if not chunk:
                break
            header += chunk
    end = header.find(b"POINT_DATA")
    return _parse_dims(header[: end if end >= 0 else len(header)].decode())


def read_vtk_scalars(path: str) -> Dict[str, np.ndarray]:
    """Minimal reader for round-trip tests: returns {name: flat array} for
    the scalar fields plus 'velocity' (N,3)."""
    out = {}
    with open(path, "rb") as fh:
        data = fh.read()
    header_end = data.find(b"POINT_DATA")
    header = data[:header_end].decode()
    binary = "BINARY" in header
    dims = _parse_dims(header)
    n = dims[0] * dims[1] * dims[2]
    pos = header_end
    body = data
    while True:
        vec = body.find(b"VECTORS", pos)
        sca = body.find(b"SCALARS", pos)
        nxt = min(x for x in (vec, sca) if x >= 0) if (vec >= 0 or sca >= 0) else -1
        if nxt < 0:
            break
        eol = body.find(b"\n", nxt)
        tokens = body[nxt:eol].decode().split()
        name = tokens[1]
        ncomp = 3 if tokens[0] == "VECTORS" else 1
        start = eol + 1
        if tokens[0] == "SCALARS":
            start = body.find(b"\n", start) + 1  # skip LOOKUP_TABLE
        if binary:
            count = n * ncomp
            arr = np.frombuffer(body, dtype=">f8", count=count, offset=start)
            pos = start + count * 8
        else:
            text_end_candidates = [body.find(k, start)
                                   for k in (b"VECTORS", b"SCALARS")]
            text_end = min([x for x in text_end_candidates if x >= 0],
                           default=len(body))
            arr = np.array(body[start:text_end].decode().split(), dtype=float)
            pos = text_end
        out[name] = arr.reshape(-1, 3) if ncomp == 3 else arr
    return out


def write_profiles(path: str, state, mesh, geom) -> None:
    """Plane-averaged y-profiles as text (reference write_fields,
    src/solver.cpp:3351): y, <u>, <v>, <w>, <p> [, <nu_t>, <k>, <omega>]."""
    u, v, w = _vel_centers(state, geom)
    cols = [mesh.y.centers,
            u.mean(axis=(0, 2)), v.mean(axis=(0, 2)), w.mean(axis=(0, 2)),
            np.asarray(state.p).mean(axis=(0, 2))]
    names = ["y", "u_mean", "v_mean", "w_mean", "p_mean"]
    if state.nu_t is not None:
        cols.append(np.asarray(state.nu_t).mean(axis=(0, 2)))
        names.append("nu_t_mean")
    if state.k is not None:
        cols.append(np.asarray(state.k).mean(axis=(0, 2)))
        cols.append(np.asarray(state.omega).mean(axis=(0, 2)))
        names += ["k_mean", "omega_mean"]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, np.column_stack(cols), header=" ".join(names))
