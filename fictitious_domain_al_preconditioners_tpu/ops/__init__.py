from .linop import LinOp, identity, zero_op, diag_op
from .operators import CellMatrix, constrain, dirichlet_rhs
from .assembly import (
    mass_matrix, laplace_matrix, rhs_vector, interpolate, l2_error, h1_error,
    imm_mass_matrix, imm_stiffness_matrix, imm_rhs,
)
from .coupling import Coupling, build_coupling
from .krylov import (
    SolveInfo, cg, minres, fgmres, gmres, cg_condition_number, lanczos_max_eig,
    batched_cg,
)
from .blocks import BlockLayout, block_operator
from .sparse import COO, spgemm_ctwc, augmented_block_coo

__all__ = [
    "LinOp", "identity", "zero_op", "diag_op", "CellMatrix", "constrain",
    "dirichlet_rhs", "mass_matrix", "laplace_matrix", "rhs_vector",
    "interpolate", "l2_error", "h1_error", "imm_mass_matrix",
    "imm_stiffness_matrix", "imm_rhs", "Coupling", "build_coupling",
    "SolveInfo", "cg", "minres", "fgmres", "gmres", "cg_condition_number",
    "lanczos_max_eig", "batched_cg", "BlockLayout", "block_operator", "COO",
    "spgemm_ctwc", "augmented_block_coo",
]
