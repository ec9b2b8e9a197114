from .immersed_laplace import ImmersedLaplaceConfig, ImmersedLaplaceProblem

__all__ = ["ImmersedLaplaceConfig", "ImmersedLaplaceProblem"]
