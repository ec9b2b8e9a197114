from .al import (
    al_preconditioner, al_preconditioner_stokes, al_preconditioner_diagonal,
    al_preconditioner_ideal, al_preconditioner_modified,
)
from .weights import (
    inv_diag, inv_diag_squared, inv_exact, inv_squared_exact,
    inv_diag_of_m_squared,
)
from .chebyshev import chebyshev
from .gmg import GMG, build_gmg, make_prolongation, Prolongation

__all__ = [
    "al_preconditioner", "al_preconditioner_stokes",
    "al_preconditioner_diagonal", "al_preconditioner_ideal",
    "al_preconditioner_modified", "inv_diag", "inv_diag_squared", "inv_exact",
    "inv_squared_exact", "inv_diag_of_m_squared", "chebyshev", "GMG",
    "build_gmg", "make_prolongation", "Prolongation",
]
