from .immersed_laplace import ImmersedLaplaceConfig, ImmersedLaplaceProblem
from .elliptic_interface import EllipticInterfaceConfig, EllipticInterfaceProblem
from .nitsche_bcs import NitscheConfig, NitscheProblem
from .stokes import StokesConfig, StokesProblem
from .elasticity import ElasticityInterfaceConfig, ElasticityInterfaceProblem

__all__ = ["ImmersedLaplaceConfig", "ImmersedLaplaceProblem",
           "EllipticInterfaceConfig", "EllipticInterfaceProblem",
           "NitscheConfig", "NitscheProblem",
           "StokesConfig", "StokesProblem",
           "ElasticityInterfaceConfig", "ElasticityInterfaceProblem"]
