"""Unit tests for the own-rolled jitted GMRES cycle / PCG
(calibr8_tpu/solve/gmres.py) — the replacement for
jax.scipy.sparse.linalg on the hot solve paths.

The reference's analog contract is the Belos solver status check
(source/calibr8/src/linear_solve.cpp:106-123): converged solves reach
the requested tolerance, and the residual reported is the TRUE one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.solve.gmres import gmres_cycle, pcg


def _mat(n, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    if spd:
        A = A @ A.T + n * np.eye(n)
    else:
        A = A + n * np.eye(n)
    return A


@pytest.mark.smoke
def test_gmres_cycle_solves_to_atol():
    n = 60
    A = _mat(n, 1)
    b = np.random.default_rng(2).standard_normal(n)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)

    dy, res, k = jax.jit(
        lambda r: gmres_cycle(lambda v: Aj @ v, r, 60, 1e-10)
    )(bj)
    x = np.asarray(dy)
    relres = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert relres < 1e-8
    assert int(k) <= 60


def test_gmres_cycle_early_exit():
    # well-conditioned SPD system: converges far inside the cycle, so
    # k_used must stop early instead of burning all `restart` matvecs
    n = 80
    A = _mat(n, 3, spd=True) + 50 * np.eye(n)
    b = np.random.default_rng(4).standard_normal(n)
    Aj = jnp.asarray(A)

    dy, res, k = jax.jit(
        lambda r: gmres_cycle(lambda v: Aj @ v, r, 80, 1e-6)
    )(jnp.asarray(b))
    assert int(k) < 60
    relres = np.linalg.norm(b - A @ np.asarray(dy)) / np.linalg.norm(b)
    assert relres < 1e-6 * 10


def test_gmres_cycle_right_preconditioned():
    n = 50
    A = _mat(n, 5)
    Minv = np.diag(1.0 / np.diag(A))
    b = np.random.default_rng(6).standard_normal(n)
    Aj, Mj = jnp.asarray(A), jnp.asarray(Minv)

    def opM(v):
        return Aj @ (Mj @ v)

    dy, res, k = jax.jit(lambda r: gmres_cycle(opM, r, 50, 1e-12))(
        jnp.asarray(b)
    )
    x = np.asarray(Mj @ dy)
    relres = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert relres < 1e-8


def test_gmres_cycle_zero_rhs():
    A = jnp.asarray(_mat(10, 7))
    dy, res, k = gmres_cycle(lambda v: A @ v, jnp.zeros(10), 10, 1e-12)
    assert np.allclose(np.asarray(dy), 0.0)
    assert int(k) == 0


def test_gmres_cycle_nonflat_shape():
    # dist vectors are (P, N, ndpn)-shaped; reductions must be global
    n = 48
    A = _mat(n, 8)
    b = np.random.default_rng(9).standard_normal(n)
    Aj = jnp.asarray(A)

    def op3(v):
        return (Aj @ v.reshape(-1)).reshape(4, 4, 3)

    dy, res, k = jax.jit(
        lambda r: gmres_cycle(op3, r, 48, 1e-10)
    )(jnp.asarray(b.reshape(4, 4, 3)))
    x = np.asarray(dy).reshape(-1)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-8


def test_gmres_cycle_dynamic_bound_loops_in_operator():
    # the whole point of the replacement: operators may contain
    # while/fori loops with DATA-DEPENDENT trip bounds (jax.scipy's
    # custom_linear_solve transposition outlawed them)
    n = 40
    A = _mat(n, 10)
    Aj = jnp.asarray(A)

    def op(v):
        anchor = (v[0] * 0).astype(jnp.int32)

        def body(_, acc):
            return acc

        v = jax.lax.fori_loop(0, 3 + anchor, body, v)
        return Aj @ v

    b = np.random.default_rng(11).standard_normal(n)
    dy, res, k = jax.jit(lambda r: gmres_cycle(op, r, 40, 1e-10))(
        jnp.asarray(b)
    )
    assert np.linalg.norm(b - A @ np.asarray(dy)) / np.linalg.norm(b) < 1e-8


def test_pcg_spd():
    n = 70
    A = _mat(n, 12, spd=True)
    b = np.random.default_rng(13).standard_normal(n)
    Aj = jnp.asarray(A)
    Minv = jnp.asarray(1.0 / np.diag(A))

    x, relres = jax.jit(
        lambda bb: pcg(
            lambda v: Aj @ v, bb, lambda r: Minv * r, 1e-10, 200
        )
    )(jnp.asarray(b))
    assert float(relres) < 1e-9
    assert np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b) < 1e-9
