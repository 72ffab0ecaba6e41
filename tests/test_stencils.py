"""Stencil op tests: exactness, convergence, and ghost-ring equivalence.

Ports of the reference's scheme tests (reference: src/test.jl:46-103) plus
equivalence checks between the roll-based interior-only ops and the reference's
ghost-ring formulation.
"""

import jax.numpy as jnp
import numpy as np

from tpu_qg.ops import arakawa_J, centered_diff_x, laplace_5p
from tpu_qg.ops.boundary import add_ghost_ring, strip_ghost_ring, update_ghost_ring


def _grid(M, L):
    """Interior periodic grid x_i = i * dx, i = 0..M-1 (right endpoint excluded)."""
    dx = L / M
    x = np.arange(M) * dx
    return dx, x


def _fit_slope(Ms, errs):
    return np.polyfit(np.log(np.asarray(Ms, float)), np.log(errs), 1)[0]


def test_laplacian_exact_on_quadratic():
    """A field whose 3rd+ derivatives vanish inside the stencil is
    differentiated exactly (analog of reference: src/test.jl:55-69, adapted to
    the interior-only periodic layout — checked away from the wrap seam)."""
    M = P = 16
    dx = 1.0
    x = np.arange(M) * dx
    u = x[:, None] ** 3 + (x[None, :] * dx) ** 2 * np.ones((M, P))
    lap = np.asarray(laplace_5p(jnp.asarray(u), dx))
    true_lap = 6.0 * x[:, None] + 2.0 * dx ** 2 * np.ones((M, P))
    # Away from the periodic seam the stencil sees a pure polynomial.
    np.testing.assert_allclose(lap[2:-2, 2:-2], true_lap[2:-2, 2:-2],
                               rtol=0, atol=1e-11)


def test_laplacian_convergence():
    """Second-order convergence on a periodic trig field."""
    L = 10.0
    errs, Ms = [], [16, 32, 64, 128]
    for M in Ms:
        dx, x = _grid(M, L)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u = np.sin(2 * np.pi * X / L) * np.cos(2 * np.pi * Y / L)
        true_lap = -2.0 * (2 * np.pi / L) ** 2 * u
        lap = np.asarray(laplace_5p(jnp.asarray(u), dx))
        errs.append(dx * np.linalg.norm(lap - true_lap))
    slope = _fit_slope(Ms, errs)
    assert -2.3 < slope < -1.7


def test_centered_diff_convergence():
    """Second-order centred x-difference (fills the reference's empty testset,
    src/test.jl:46-52)."""
    L = 10.0
    errs, Ms = [], [16, 32, 64, 128]
    for M in Ms:
        dx, x = _grid(M, L)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u = np.sin(2 * np.pi * X / L) * np.cos(2 * np.pi * Y / L)
        true_dudx = (2 * np.pi / L) * np.cos(2 * np.pi * X / L) * np.cos(2 * np.pi * Y / L)
        d = np.asarray(centered_diff_x(jnp.asarray(u), dx))
        errs.append(dx * np.linalg.norm(d - true_dudx))
    slope = _fit_slope(Ms, errs)
    assert -2.3 < slope < -1.7


def test_arakawa_convergence():
    """Arakawa Jacobian second-order convergence (reference: src/test.jl:71-103
    computes this but asserts nothing; we assert the slope band)."""
    L = 10.0
    errs, Ms = [], [16, 32, 64, 128, 256]
    for M in Ms:
        dx, x = _grid(M, L)
        X, Y = np.meshgrid(x, x, indexing="ij")
        k = 2 * np.pi / L
        A = np.sin(k * X) * np.sin(k * Y)
        B = np.cos(k * X) * np.cos(k * Y)
        true_J = (-k ** 2 * np.cos(k * X) ** 2 * np.sin(k * Y) ** 2
                  + k ** 2 * np.sin(k * X) ** 2 * np.cos(k * Y) ** 2)
        J = np.asarray(arakawa_J(jnp.asarray(A), jnp.asarray(B), dx))
        errs.append(dx * np.linalg.norm(J - true_J))
    slope = _fit_slope(Ms, errs)
    assert -2.3 < slope < -1.7


def test_arakawa_conservation():
    """The Arakawa scheme's design property: sum(J) = 0, sum(zeta*J) = 0,
    sum(psi*J) = 0 over the periodic domain (energy + enstrophy conservation;
    the property the reference's scheme choice exists for)."""
    rng = np.random.default_rng(0)
    zeta = rng.standard_normal((64, 48))
    psi = rng.standard_normal((64, 48))
    J = np.asarray(arakawa_J(jnp.asarray(zeta), jnp.asarray(psi), 0.7))
    assert abs(J.sum()) < 1e-10
    assert abs((zeta * J).sum()) < 1e-9
    assert abs((psi * J).sum()) < 1e-9


def test_arakawa_antisymmetry():
    """J(a, b) = -J(b, a)."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((32, 32)))
    b = jnp.asarray(rng.standard_normal((32, 32)))
    np.testing.assert_allclose(np.asarray(arakawa_J(a, b, 1.3)),
                               -np.asarray(arakawa_J(b, a, 1.3)), atol=1e-12)


def test_ghost_ring_roundtrip():
    """add/strip/update ghost ring parity with the reference layout
    (reference: src/schemes/boundary_conditions.jl:1-22)."""
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((6, 5)))
    g = add_ghost_ring(u)
    assert g.shape == (8, 7)
    # ghost columns/rows are periodic copies
    np.testing.assert_array_equal(np.asarray(g[0, 1:-1]), np.asarray(u[-1]))
    np.testing.assert_array_equal(np.asarray(g[-1, 1:-1]), np.asarray(u[0]))
    np.testing.assert_array_equal(np.asarray(g[1:-1, 0]), np.asarray(u[:, -1]))
    np.testing.assert_array_equal(np.asarray(g[1:-1, -1]), np.asarray(u[:, 0]))
    # corners copied diagonally
    assert g[0, 0] == u[-1, -1] and g[-1, -1] == u[0, 0]
    assert g[0, -1] == u[-1, 0] and g[-1, 0] == u[0, -1]
    np.testing.assert_array_equal(np.asarray(strip_ghost_ring(g)), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(update_ghost_ring(g)), np.asarray(g))


def test_interior_ops_match_ghost_ring_formulation():
    """The roll-based interior ops equal the reference's ghost-ring sweep: apply
    the op to a ghost-extended array the reference way (compute interior from
    ghosts), then compare interiors."""
    rng = np.random.default_rng(3)
    M, P = 12, 9
    dx = 0.37
    u = rng.standard_normal((M, P))
    g = np.asarray(add_ghost_ring(jnp.asarray(u)))

    # Reference-style interior sweep of the 5-point Laplacian
    # (reference: src/schemes/laplacian.jl:19-23).
    ref = np.zeros((M, P))
    for i in range(1, M + 1):
        for j in range(1, P + 1):
            ref[i - 1, j - 1] = (g[i - 1, j] + g[i + 1, j] - 4 * g[i, j]
                                 + g[i, j - 1] + g[i, j + 1]) / dx ** 2
    ours = np.asarray(laplace_5p(jnp.asarray(u), dx))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)
