"""TPU-native fictitious-domain / DLM finite element framework with
Augmented-Lagrangian block preconditioners.

A from-scratch JAX/XLA re-design of the capabilities of
fdrmrc/fictitious_domain_AL_preconditioners (deal.II/Trilinos/UMFPACK).
See README.md for the architecture and PARITY.md for the component map.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (repo-local ``.jax_cache``).

    Compiles through the tunneled TPU backend take minutes; the cache makes
    every re-run of an already-seen program (bench rows, experiment matrix,
    CLI drives) start in seconds.  Respects an explicit
    ``JAX_COMPILATION_CACHE_DIR`` and stays silent off-disk failures."""
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          _os.path.join(_os.path.dirname(__file__), _os.pardir,
                                        ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

from . import core, models, ops, parallel, precond, utils  # noqa: F401,E402

__all__ = ["core", "models", "ops", "parallel", "precond", "utils",
           "__version__"]
