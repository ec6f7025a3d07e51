"""Chunked trailing-layout kernel evaluation (fem/assembly.py
chunked_trailing): at scale (1.5M elements) the fused tangent kernels
must run in element chunks to bound the live HBM temp; the chunked
program must be numerically identical to the monolithic one, including
the edge-replicating pad when the chunk does not divide n_elem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem.assembly import chunked_trailing
from calibr8_tpu.problem import Problem

from tests.decks import CUBE, J2_MAT, BCS_3D, make_deck


@pytest.fixture(scope="module")
def prob():
    deck = make_deck(CUBE, "small_J2", J2_MAT, BCS_3D(0.02), 2)
    return Problem(load_deck(deck))


def _state(prob):
    a = prob.assembler
    disc = prob.disc
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(disc.n_dofs) * 1e-3, disc.dtype)
    x_prev = jnp.zeros(disc.n_dofs, disc.dtype)
    xi_prev = jnp.zeros((disc.n_elem, a.nxi), disc.dtype)
    loc = a.local_solve(x, x_prev, xi_prev, prob.params0)
    return x, x_prev, loc.xi, xi_prev, loc.path


def _kernel_args(prob, x, x_prev, xi, xi_prev, path):
    a = prob.assembler
    disc = prob.disc
    return (
        a.gather(x).T,
        a.gather(x_prev).T,
        xi.T,
        xi_prev.T,
        path,
        jnp.moveaxis(disc.grad_N, 0, -1),
        disc.detJ,
        disc.h,
        a.params_per_elem(prob.params0).T,
    )


@pytest.mark.parametrize("chunk", [16, 17])  # 17 does not divide n_elem
def test_rj_kernel_chunked_matches(prob, chunk):
    a = prob.assembler
    args = _kernel_args(prob, *_state(prob))
    assert prob.disc.n_elem > 2 * chunk  # chunking actually engages
    full = a.make_rj_kernel()
    # rebuild the raw (unwrapped) kernel with a tiny chunk
    R0, J0 = jax.jit(full)(*args)
    Rc, Jc = jax.jit(chunked_trailing(full, chunk=chunk))(*args)
    np.testing.assert_allclose(np.asarray(Rc), np.asarray(R0), rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(J0), rtol=0, atol=1e-13)


def test_adjoint_blocks_chunked_matches(prob):
    a = prob.assembler
    args = _kernel_args(prob, *_state(prob))
    full = a.make_adjoint_blocks_kernel()
    B0 = jax.jit(full)(*args)
    Bc = jax.jit(chunked_trailing(full, chunk=13))(*args)
    assert set(Bc) == set(B0)
    for k in B0:
        np.testing.assert_allclose(
            np.asarray(Bc[k]), np.asarray(B0[k]), rtol=0, atol=1e-13,
            err_msg=k,
        )
