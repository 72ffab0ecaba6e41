# %% [markdown]
# # Scheme validation — convergence studies
#
# Counterpart of the reference's `notebooks/jupyter/scheme_validation.ipynb`:
# re-runs the method-of-manufactured-solutions convergence studies for the
# Laplacian, Arakawa Jacobian, Poisson and modified-Helmholtz solvers at large
# M (up to 512) and saves log-log plots to `plots/`.
#
# Runnable as a script (`python notebooks/scheme_validation.py`) or cell-by-cell
# in Jupyter via the percent format.

# %%
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from tpu_qg.ops import arakawa_J, laplace_5p, solve_helmholtz, solve_poisson

PLOTS = pathlib.Path(__file__).resolve().parent.parent / "plots"
PLOTS.mkdir(exist_ok=True)

M_LIST = [8, 16, 32, 64, 128, 256, 512]
L = 3.0


def grid(M):
    dx = L / M
    x = np.arange(M) * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    return dx, X, Y


def loglog_plot(name, errs, slope):
    fig, ax = plt.subplots()
    ax.loglog(M_LIST, errs, "o-")
    ax.set_xlabel("M")
    ax.set_ylabel("weighted 2-norm error")
    ax.set_title(f"{name}: slope = {slope:.3f}")
    ax.grid(True, which="both", alpha=0.3)
    fig.savefig(PLOTS / f"convergence_{name}.png", dpi=120,
                bbox_inches="tight")
    plt.close(fig)


def study(name, err_fn):
    errs = []
    for M in M_LIST:
        errs.append(err_fn(M))
    slope = np.polyfit(np.log(M_LIST), np.log(errs), 1)[0]
    print(f"{name:>12s}: slope {slope:+.3f}   errors {errs[0]:.2e} -> {errs[-1]:.2e}")
    loglog_plot(name, errs, slope)
    return slope


# %% Laplacian
def lap_err(M):
    dx, X, Y = grid(M)
    k = 2 * np.pi / L
    u = np.sin(k * X) * np.cos(k * Y)
    true = -2 * k * k * u
    num = np.asarray(laplace_5p(jnp.asarray(u), dx))
    return dx * np.linalg.norm(num - true)


study("laplacian", lap_err)


# %% Arakawa Jacobian
def arakawa_err(M):
    dx, X, Y = grid(M)
    k = 2 * np.pi / L
    A = np.sin(k * X) * np.sin(k * Y)
    B = np.cos(k * X) * np.cos(k * Y)
    true = (-k * k * np.cos(k * X) ** 2 * np.sin(k * Y) ** 2
            + k * k * np.sin(k * X) ** 2 * np.cos(k * Y) ** 2)
    num = np.asarray(arakawa_J(jnp.asarray(A), jnp.asarray(B), dx))
    return dx * np.linalg.norm(num - true)


study("arakawa", arakawa_err)


# %% Poisson solve
def poisson_err(M):
    dx, X, Y = grid(M)
    k = 2 * np.pi / L
    u = np.sin(k * X) * np.cos(k * Y)
    f = -2 * k * k * u
    num = np.asarray(solve_poisson(jnp.asarray(f), dx))
    return dx * np.linalg.norm(num - u)


study("poisson", poisson_err)


# %% Modified Helmholtz solve (alpha = -3)
def helmholtz_err(M):
    dx, X, Y = grid(M)
    k = 2 * np.pi / L
    alpha = -3.0
    u = np.sin(k * X) * np.cos(k * Y)
    f = -2 * k * k * u + alpha * u
    num = np.asarray(solve_helmholtz(jnp.asarray(f), dx, alpha))
    return dx * np.linalg.norm(num - u)


study("helmholtz", helmholtz_err)

print(f"plots saved to {PLOTS}")
