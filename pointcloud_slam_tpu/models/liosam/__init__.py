"""LIO-SAM style pipeline: projection, LOAM features, scan-to-map matching,
ScanContext loop closure, pose-graph back-end."""

from . import backend, features, projection, scan2map, scancontext
from .backend import BackendConfig, PoseGraph
from .features import FeatureConfig, Features
from .projection import ProjectionConfig, RangeImage
from .scan2map import Scan2MapConfig, Scan2MapResult
from .scancontext import ScanContextConfig

__all__ = [
    "projection",
    "features",
    "scan2map",
    "scancontext",
    "backend",
    "ProjectionConfig",
    "RangeImage",
    "FeatureConfig",
    "Features",
    "Scan2MapConfig",
    "Scan2MapResult",
    "ScanContextConfig",
    "BackendConfig",
    "PoseGraph",
]
