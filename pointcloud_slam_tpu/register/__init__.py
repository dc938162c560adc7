"""Registration: shared GN/LM SE(3) solver, point-to-plane ICP, NDT, (V)GICP."""

from . import icp, solver
from .icp import ICPConfig, ICPResult, build_target_map, fitness_score, point_to_plane_icp
from .solver import SolveResult, SolverConfig, gauss_newton, levenberg_marquardt

__all__ = [
    "icp",
    "solver",
    "ICPConfig",
    "ICPResult",
    "point_to_plane_icp",
    "build_target_map",
    "fitness_score",
    "SolverConfig",
    "SolveResult",
    "gauss_newton",
    "levenberg_marquardt",
]
