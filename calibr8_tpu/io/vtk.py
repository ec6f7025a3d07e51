"""VTK (VTU/PVD) output for visualization.

The analog of the reference's apf::writeVtkFiles PVD/VTU output per load
step (reference: source/calibr8/src/main_primal.cpp:129-196): one .vtu
per step holding displacement/pressure point data plus per-element local
state, indexed by a .pvd collection.
"""

from __future__ import annotations

import os

import numpy as np

_VTK_CELL = {2: 5, 3: 10}  # triangle, tetra


def write_vtu(path, mesh, point_data=None, cell_data=None):
    coords = np.asarray(mesh.coords, dtype=float)
    conn = np.asarray(mesh.conn)
    n_nodes, dim = coords.shape
    n_cells, npe = conn.shape
    if dim == 2:
        coords = np.concatenate([coords, np.zeros((n_nodes, 1))], axis=1)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write(
            '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">\n'
        )
        f.write("<UnstructuredGrid>\n")
        f.write(f'<Piece NumberOfPoints="{n_nodes}" NumberOfCells="{n_cells}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">\n')
        np.savetxt(f, coords, fmt="%.10e")
        f.write("</DataArray></Points>\n")
        f.write("<Cells>\n")
        f.write('<DataArray type="Int32" Name="connectivity" format="ascii">\n')
        np.savetxt(f, conn, fmt="%d")
        f.write("</DataArray>\n")
        f.write('<DataArray type="Int32" Name="offsets" format="ascii">\n')
        np.savetxt(f, (np.arange(1, n_cells + 1) * npe)[:, None], fmt="%d")
        f.write("</DataArray>\n")
        f.write('<DataArray type="UInt8" Name="types" format="ascii">\n')
        np.savetxt(f, np.full((n_cells, 1), _VTK_CELL[dim]), fmt="%d")
        f.write("</DataArray>\n")
        f.write("</Cells>\n")
        f.write("<PointData>\n")
        for name, arr in (point_data or {}).items():
            arr = np.asarray(arr, dtype=float)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            if ncomp == 2:  # pad 2D vectors for paraview
                arr = np.concatenate([arr, np.zeros((arr.shape[0], 1))], axis=1)
                ncomp = 3
            f.write(
                f'<DataArray type="Float64" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n'
            )
            np.savetxt(f, arr.reshape(arr.shape[0], -1), fmt="%.10e")
            f.write("</DataArray>\n")
        f.write("</PointData>\n")
        f.write("<CellData>\n")
        for name, arr in (cell_data or {}).items():
            arr = np.asarray(arr, dtype=float)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            f.write(
                f'<DataArray type="Float64" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n'
            )
            np.savetxt(f, arr.reshape(arr.shape[0], -1), fmt="%.10e")
            f.write("</DataArray>\n")
        f.write("</CellData>\n")
        f.write("</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def write_pvd(basename, prob, traj):
    """One VTU per step + a PVD collection (main_primal.cpp write_at_step),
    including the postprocessed Cauchy stress (eval_cauchy analog)."""
    from calibr8_tpu.fem.postprocess import eval_cauchy

    os.makedirs(os.path.dirname(basename) or ".", exist_ok=True)
    entries = []
    for step, x in enumerate(traj.x):
        u, p = prob.disc.split(x)
        pd = {"u": np.asarray(u)}
        if p is not None:
            pd["p"] = np.asarray(p)
        cd = {"xi": np.asarray(traj.xi[step])}
        x_prev = traj.x[step - 1] if step > 0 else traj.x[0]
        cd["cauchy"] = np.asarray(
            eval_cauchy(prob.assembler, x, x_prev, traj.xi[step], prob.params0)
        )
        if step < len(traj.path):
            cd["path"] = np.asarray(traj.path[step], dtype=float)
        vtu = f"{basename}_{step}.vtu"
        write_vtu(vtu, prob.disc.mesh, pd, cd)
        entries.append((step, os.path.basename(vtu)))
    with open(f"{basename}.pvd", "w") as f:
        f.write('<?xml version="1.0"?>\n<VTKFile type="Collection" version="0.1">\n')
        f.write("<Collection>\n")
        for step, vtu in entries:
            f.write(f'<DataSet timestep="{step}" file="{vtu}"/>\n')
        f.write("</Collection>\n</VTKFile>\n")
