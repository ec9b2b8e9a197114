"""TPU-native fictitious-domain / DLM finite element framework with
Augmented-Lagrangian block preconditioners.

A from-scratch JAX/XLA re-design of the capabilities of
fdrmrc/fictitious_domain_AL_preconditioners (deal.II/Trilinos/UMFPACK).
See README.md for the architecture and PARITY.md for the component map.
"""

__version__ = "0.1.0"

from . import core, models, ops, parallel, precond, utils  # noqa: F401

__all__ = ["core", "models", "ops", "parallel", "precond", "utils",
           "__version__"]
