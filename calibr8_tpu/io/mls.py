"""Moving-least-squares smoothing of noisy full-field (DIC) data.

The analog of the reference's Compadre GMLS utilities
(reference: source/calibr8/src/moving_least_squares.cpp:11-23,
moving_least_squares_two_meshes.cpp) used in the synthetic-DIC pipeline
forward -> perturb -> MLS-filter -> calibrate
(examples/synthetic_calibration/forward/add_noise_and_filter.sh:1-24).

For every target point, fit a polynomial of the given order to the
neighboring source values (Gaussian-weighted within a support radius)
and evaluate at the target — supports smoothing on one mesh and mapping
data between meshes (DIC grid -> FE mesh).
"""

from __future__ import annotations

import numpy as np


def _poly_basis(dx, order: int):
    """Monomial basis at offsets dx: (n_pts, dim) -> (n_pts, n_basis)."""
    n, dim = dx.shape
    cols = [np.ones(n)]
    if order >= 1:
        for d in range(dim):
            cols.append(dx[:, d])
    if order >= 2:
        for d in range(dim):
            for e in range(d, dim):
                cols.append(dx[:, d] * dx[:, e])
    if order >= 3:
        for d in range(dim):
            cols.append(dx[:, d] ** 3)
    return np.stack(cols, axis=1)


def mls_smooth(
    src_coords: np.ndarray,
    src_values: np.ndarray,
    tgt_coords: np.ndarray,
    radius: float,
    order: int = 2,
    min_neighbors: int = None,
) -> np.ndarray:
    """GMLS-style reconstruction of values at target points."""
    from scipy.spatial import cKDTree

    src_values = np.asarray(src_values, dtype=float)
    scalar = src_values.ndim == 1
    if scalar:
        src_values = src_values[:, None]
    tree = cKDTree(src_coords)
    n_basis = _poly_basis(np.zeros((1, src_coords.shape[1])), order).shape[1]
    min_neighbors = min_neighbors or (n_basis + 2)
    out = np.zeros((tgt_coords.shape[0], src_values.shape[1]))
    for i, xt in enumerate(tgt_coords):
        r = radius
        idx = tree.query_ball_point(xt, r)
        while len(idx) < min_neighbors:
            r *= 1.5
            idx = tree.query_ball_point(xt, r)
        dx = src_coords[idx] - xt[None, :]
        P = _poly_basis(dx, order)
        w = np.exp(-(np.sum(dx * dx, axis=1)) / (0.5 * r * r))
        Pw = P * w[:, None]
        # weighted least squares: coefficients c solve (P^T W P) c = P^T W v
        A = P.T @ Pw
        for c in range(src_values.shape[1]):
            rhs = Pw.T @ src_values[idx, c]
            coef = np.linalg.lstsq(A, rhs, rcond=None)[0]
            out[i, c] = coef[0]  # basis evaluated at dx = 0
    return out[:, 0] if scalar else out


def mls_filter_npz(fields_path, coords_path, out_path, radius=0.1, order=2):
    """Smooth every measured_<step> field in an .npz in place onto the
    same coordinates (the `mls` CLI)."""
    data = dict(np.load(fields_path))
    coords = np.load(coords_path)
    for k in list(data):
        if k.startswith("measured_"):
            data[k] = mls_smooth(coords, data[k], coords, radius, order)
    np.savez_compressed(out_path, **data)
