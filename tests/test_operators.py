"""Linear-algebra structure tests on the explicit sparse operators
(reference: src/test.jl:219-276)."""

import numpy as np

from tpu_qg.ops import operators as op


def _is_posdef(A):
    """Smallest eigenvalue of the (symmetric) sparse matrix is positive."""
    Ad = A.toarray()
    return np.all(np.linalg.eigvalsh(Ad) > 0)


def test_1d_periodic_laplacian_exact():
    """Exact 4x4 periodic 1-D Laplacian (reference: src/test.jl:229-238)."""
    lap = op.laplacian_1d_periodic(4).toarray()
    expected = np.array([
        [-2.0, 1.0, 0.0, 1.0],
        [1.0, -2.0, 1.0, 0.0],
        [0.0, 1.0, -2.0, 1.0],
        [1.0, 0.0, 1.0, -2.0],
    ])
    np.testing.assert_array_equal(lap, expected)


def test_2d_laplacian_shapes():
    """(reference: src/test.jl:240-244)."""
    assert op.laplacian_2d(3, 3).shape == (9, 9)
    assert op.laplacian_2d_doubly_periodic(4, 3).shape == (12, 12)


def test_poisson_matrix_posdef():
    """-construct_spA(alpha=0) is positive semi-definite; gauge-fixed version is
    positive definite (reference: src/test.jl:219-227 + laplacian.jl:66-75)."""
    A = op.gauge_fixed_poisson_matrix(4, 3, 1.0)
    Ad = A.toarray()
    np.testing.assert_allclose(Ad, Ad.T)
    assert _is_posdef(A)


def test_helmholtz_matrix_posdef():
    """Square and non-square pinned Helmholtz matrices are symmetric pos-def
    (reference: src/test.jl:246-276)."""
    for (M, P, alpha, dx) in [(4, 4, -3.0, 0.5), (10, 5, -1.0, 1.0)]:
        A = (-op.construct_spA(M, P, dx, alpha)).tolil()
        A[:, 0] = 0.0
        A[0, :] = 0.0
        A[0, 0] = 1.0
        Ad = A.toarray()
        np.testing.assert_allclose(Ad, Ad.T)
        assert np.all(np.linalg.eigvalsh(Ad) > 0)


def test_unpinned_helmholtz_posdef():
    """Without gauge fixing, -A is positive definite for alpha < 0."""
    A = -op.construct_spA(6, 6, 0.7, -2.0)
    assert _is_posdef(A)


def test_matrix_action_matches_stencil():
    """construct_spA applied to vec(u) equals (lap + alpha) u from the stencil
    path — ties the matrix world to the matrix-free world."""
    import jax.numpy as jnp
    from tpu_qg.ops.stencils import laplace_5p

    rng = np.random.default_rng(0)
    M, P, dx, alpha = 8, 6, 0.3, -1.5
    u = rng.standard_normal((M, P))
    A = op.construct_spA(M, P, dx, alpha)
    matvec = (A @ u.reshape(-1, order="F")).reshape((M, P), order="F")
    stencil = np.asarray(laplace_5p(jnp.asarray(u), dx)) + alpha * u
    np.testing.assert_allclose(matvec, stencil, atol=1e-12)


def test_factorized_solver_solves():
    """FactorizedSolver really inverts (lap + alpha)."""
    import jax.numpy as jnp
    from tpu_qg.ops.stencils import laplace_5p

    rng = np.random.default_rng(1)
    M, P, dx, alpha = 12, 10, 0.5, -2.0
    f = rng.standard_normal((M, P))
    u = op.FactorizedSolver(M, P, dx, alpha).solve(f)
    residual = np.asarray(laplace_5p(jnp.asarray(u), dx)) + alpha * u - f
    np.testing.assert_allclose(residual, 0.0, atol=1e-10)
