from .diagnostics import cfl_number, diagnostics, energy, enstrophy  # noqa: F401
