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


def _quat_from_R(R):
    from ..geom import so3

    return np.asarray(so3.to_quat(jnp.asarray(np.asarray(R), jnp.float32)))


def save_pose_graph_g2o(path: str, graph):
    """g2o text export of a PoseGraph (the reference saves its gtsam graph via
    writeG2o next to the keyframe artifacts, mapOptmization.cpp:1868-1880).

    Emits VERTEX_SE3:QUAT for the active nodes, EDGE_SE3:QUAT for odometry and
    loop between-factors with their diagonal information (upper triangle)."""
    n = int(np.asarray(graph.n))
    nl = int(np.asarray(graph.n_loops))
    R = np.asarray(graph.R)
    t = np.asarray(graph.t)
    with open(path, "w") as f:
        for k in range(n):
            q = _quat_from_R(R[k])
            f.write(f"VERTEX_SE3:QUAT {k} " + " ".join(f"{v:.9f}" for v in (*t[k], *q)) + "\n")

        def edge(i, j, Rm, tm, info6):
            q = _quat_from_R(Rm)
            # g2o information matrix upper triangle (21 values), diagonal-only;
            # g2o edge ordering is [x y z qx qy qz] -> translation first
            I = np.zeros((6, 6))
            I[0, 0], I[1, 1], I[2, 2] = info6[3], info6[4], info6[5]
            I[3, 3], I[4, 4], I[5, 5] = info6[0], info6[1], info6[2]
            upper = [I[a, b] for a in range(6) for b in range(a, 6)]
            f.write(
                f"EDGE_SE3:QUAT {i} {j} "
                + " ".join(f"{v:.9f}" for v in (*tm, *q))
                + " " + " ".join(f"{v:.6f}" for v in upper) + "\n"
            )

        oR, ot, oi = np.asarray(graph.odom_R), np.asarray(graph.odom_t), np.asarray(graph.odom_info)
        for k in range(1, n):
            edge(k - 1, k, oR[k], ot[k], oi[k])
        lR, lt, li = np.asarray(graph.loop_R), np.asarray(graph.loop_t), np.asarray(graph.loop_info)
        la, lb = np.asarray(graph.loop_i), np.asarray(graph.loop_j)
        for k in range(nl):
            edge(int(la[k]), int(lb[k]), lR[k], lt[k], li[k])


def load_pose_graph_g2o(path: str):
    """Parse a g2o file -> (ids, positions (N,3), quats_xyzw (N,4), edges).

    edges = list of (i, j, t (3,), q_xyzw (4,), info_diag (6,) [rot, trans])."""
    ids, ts, qs, edges = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                ids.append(int(parts[1]))
                vals = [float(v) for v in parts[2:9]]
                ts.append(vals[0:3])
                qs.append(vals[3:7])
            elif parts[0] == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                vals = [float(v) for v in parts[3:10]]
                upper = [float(v) for v in parts[10:31]]
                I = np.zeros((6, 6))
                k = 0
                for a in range(6):
                    for b in range(a, 6):
                        I[a, b] = upper[k]
                        k += 1
                info = np.array([I[3, 3], I[4, 4], I[5, 5], I[0, 0], I[1, 1], I[2, 2]])
                edges.append((i, j, np.array(vals[0:3]), np.array(vals[3:7]), info))
    return ids, np.array(ts), np.array(qs), edges


def save_keyframe_artifacts(out_dir: str, k: int, surf_pts, surf_mask, descriptor,
                            corner_pts=None, corner_mask=None):
    """Per-keyframe artifact persistence (saveKeyFramesAndFactor
    mapOptmization.cpp:1868-1880: Scans/*.pcd + SCDs/*.scd).

    Clouds are (3, N) with boolean masks; saved in the keyframe's own frame."""
    import os

    from ..io import pcd as pcdio

    scans = os.path.join(out_dir, "Scans")
    scds = os.path.join(out_dir, "SCDs")
    os.makedirs(scans, exist_ok=True)
    os.makedirs(scds, exist_ok=True)
    sp = np.asarray(surf_pts).T[np.asarray(surf_mask)]
    pcdio.write_pcd(os.path.join(scans, f"{k:06d}.pcd"), sp)
    save_scd(os.path.join(scds, f"{k:06d}.scd"), descriptor)
    if corner_pts is not None:
        cp = np.asarray(corner_pts).T[np.asarray(corner_mask)]
        pcdio.write_pcd(os.path.join(scans, f"{k:06d}_corner.pcd"), cp)
