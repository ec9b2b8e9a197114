from .lattice import (LatticeOps, to_lattice, to_flat, flat_to_lattice,
                      lattice_prolong, lattice_restrict)
from .mesh import (make_mesh, lattice_sharding, replicated,
                   sharded_al_cg_step, sharded_two_level_step, padded_shape)

__all__ = ["LatticeOps", "to_lattice", "to_flat", "flat_to_lattice",
           "lattice_prolong", "lattice_restrict",
           "make_mesh", "lattice_sharding", "replicated",
           "sharded_al_cg_step", "sharded_two_level_step", "padded_shape"]
