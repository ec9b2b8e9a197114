from .quadrature import gauss, GaussRule
from .fe import FE, DGPElement
from .grid import UniformGrid, GridSpace
from .immersed import (
    ImmersedMesh, ImmersedSpace, parametrized_curve, hyper_sphere,
    immersed_uniform_grid, boundary_mesh,
)

__all__ = [
    "gauss", "GaussRule", "FE", "DGPElement", "UniformGrid", "GridSpace",
    "ImmersedMesh", "ImmersedSpace", "parametrized_curve", "hyper_sphere",
    "immersed_uniform_grid", "boundary_mesh",
]
