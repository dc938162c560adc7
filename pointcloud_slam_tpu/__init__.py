"""pointcloud_slam_tpu — a TPU-native LiDAR SLAM framework in JAX/Pallas.

A from-scratch rebuild of the capabilities of the matiable/pointcloud-slam
C++/ROS stack (Faster-LIO odometry, LIO-SAM pose-graph SLAM, NDT/GICP/VGICP
registration, prior-map localization, occupancy mapping) designed TPU-first:
fixed-capacity voxel-hash grids with gather/scatter kernels, batched
residual/Jacobian reductions feeding vectorized GN/LM SE(3) solvers, a pure
jittable iterated error-state Kalman filter, and a sparse LM/PCG pose-graph
back-end — the whole odometry loop runs on-device with no per-frame host
round-trips.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/estimation math needs true float32 accumulation: at TPU-default
# bf16 matmul precision, chained 3x3 rotation products and normal-equation
# solves lose ~3 decimal digits and the filters drift. The hot kernels are
# bandwidth/gather-bound, not MXU-bound, so this costs little.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import geom, io, maps, models, ops, parallel, register, utils  # noqa: E402

__all__ = ["geom", "ops", "register", "models", "maps", "parallel", "io", "utils"]
