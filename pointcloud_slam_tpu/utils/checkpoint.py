"""Checkpoint / resume of pipeline states (filter, maps, keyframe store).

Behavioral parity target (SURVEY.md §5 checkpoint/resume): the reference's
"checkpoints" are map artifacts — accumulated PCDs (laser_mapping.cc:776-791),
per-keyframe clouds + ScanContext `.scd` + g2o pose graph
(mapOptmization.cpp:1868-1880), rebuilt offline by construct_full_map.sh.
Here any pytree state (LIOState, SLAMState, PoseGraph) round-trips through a
single .npz — plus the reference-compatible artifact exports (poses in
KITTI/TUM format, per-keyframe SCD)."""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, state: Any):
    """Serialize any pytree of arrays to one .npz (+ structure)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)


def load_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_state, using `like` for the structure."""
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = int(data["n_leaves"])
    assert n == len(leaves_like), f"checkpoint has {n} leaves, expected {len(leaves_like)}"
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)


def save_trajectory_tum(path: str, times, positions, quats_xyzw):
    """TUM format: t x y z qx qy qz qw (laser_mapping.cc Savetrajectory)."""
    with open(path, "w") as f:
        for t, p, q in zip(times, positions, quats_xyzw):
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def save_poses_kitti(path: str, rotations, positions):
    """KITTI format: row-major 3x4 per line
    (mapOptmization.cpp saveOptimizedVerticesKITTIformat)."""
    with open(path, "w") as f:
        for R, t in zip(rotations, positions):
            M = np.concatenate([np.asarray(R), np.asarray(t).reshape(3, 1)], axis=1)
            f.write(" ".join(f"{v:.9f}" for v in M.reshape(-1)) + "\n")


def save_scd(path: str, descriptor):
    """ScanContext descriptor as whitespace text (SCManager SCD persistence)."""
    np.savetxt(path, np.asarray(descriptor), fmt="%.3f")


def load_scd(path: str):
    return np.loadtxt(path, dtype=np.float32)
