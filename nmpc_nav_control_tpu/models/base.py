"""Model abstraction for the NMPC engine.

The reference generates a per-model C solver library from a CasADi symbolic
model (``/root/reference/scripts/*/..._amr_model.py``).  Here a model is just a
pure JAX function ``f(x, u, p) -> xdot`` plus static metadata; the solver is a
generic jitted RTI engine that specializes on these static shapes at trace
time — no code generation step exists or is needed.

``ModelSpec`` is static (hashable) and is closed over / passed statically into
jitted functions.  All numeric data (parameters ``p``, bounds, weights) flows
through as traced arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

__all__ = ["ModelSpec"]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static description of a robot dynamics model.

    Attributes:
      name:   model identifier ('diff', 'omni4', 'tric').
      nx:     number of states.
      nu:     number of control inputs.
      npar:   number of model parameters (entries of ``p``).
      idxbx:  state indices with box bounds at stages 1..N and the terminal
              stage (reference ``scripts/*/generate_c_code.py`` ``idxbx``).
      idxbu:  input indices with box bounds at stages 0..N-1 (``idxbu``).
      f:      continuous-time dynamics ``f(x[nx], u[nu], p[npar]) -> xdot[nx]``.
    """

    name: str
    nx: int
    nu: int
    npar: int
    idxbx: Tuple[int, ...]
    idxbu: Tuple[int, ...]
    f: Callable = dataclasses.field(compare=False)

    @property
    def nbx(self) -> int:
        return len(self.idxbx)

    @property
    def nbu(self) -> int:
        return len(self.idxbu)

    @property
    def ny(self) -> int:
        """Residual size of the stage cost y = (x, u)."""
        return self.nx + self.nu
