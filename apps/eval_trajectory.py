#!/usr/bin/env python
"""Trajectory evaluation: ATE + RPE against a ground-truth TUM file.

Behavioral parity target: the reference's result-analysis scripts
(`src/jueying_lio/result/rpe_odom.py`, plot_time_usage.py) — relative pose
error over fixed deltas plus absolute trajectory error after Umeyama
alignment. Host-side numpy tool.
"""

import argparse
import sys

import numpy as np


def load_tum(path):
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:4], data[:, 4:8]  # t, xyz, quat xyzw


def rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w < 1e-9:
        return np.array([0.0, 0.0, 0.0, 1.0])
    return np.array([(R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
                     (R[1, 0] - R[0, 1]) / (4 * w), w])


def load_kitti(path, rate_hz=10.0):
    """KITTI odometry format (row-major 3x4 per line). Poses are made
    frame-0-relative (the est trajectory convention) and stamped at
    frame_index / rate — the association path is then shared with TUM."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    R0, t0 = data[0, :, :3], data[0, :, 3]
    pos = np.einsum("ij,kj->ki", R0.T, data[:, :, 3] - t0)
    Rs = np.einsum("ij,kjl->kil", R0.T, data[:, :, :3])
    quat = np.stack([rot_to_quat(R) for R in Rs])
    t = np.arange(len(data)) / rate_hz
    return t, pos, quat


def quat_to_rot(q):
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n if n > 0 else 0.0
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
        [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
        [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
    ])


def associate(t_a, t_b, max_dt=0.02):
    """Nearest-stamp association."""
    ia, ib = [], []
    j = 0
    for i, ta in enumerate(t_a):
        j = int(np.argmin(np.abs(t_b - ta)))
        if abs(t_b[j] - ta) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia), np.asarray(ib)


def umeyama_align(src, dst):
    """Rigid alignment (no scale) src -> dst."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    S = (dst - mu_d).T @ (src - mu_s) / len(src)
    U, _, Vt = np.linalg.svd(S)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    return R, t


def ate(gt_pos, est_pos):
    R, t = umeyama_align(est_pos, gt_pos)
    aligned = est_pos @ R.T + t
    err = np.linalg.norm(aligned - gt_pos, axis=1)
    return {"rmse": float(np.sqrt((err ** 2).mean())), "mean": float(err.mean()), "max": float(err.max())}


def rpe(gt_t, gt_pos, gt_q, est_t, est_pos, est_q, delta=1.0):
    """Relative pose error over time deltas (trans [m] and rot [deg])."""
    terrs, rerrs = [], []
    for i in range(len(gt_t)):
        j = int(np.searchsorted(gt_t, gt_t[i] + delta))
        if j >= len(gt_t):
            break
        dg = quat_to_rot(gt_q[i]).T @ (gt_pos[j] - gt_pos[i])
        de = quat_to_rot(est_q[i]).T @ (est_pos[j] - est_pos[i])
        terrs.append(np.linalg.norm(dg - de))
        Rg = quat_to_rot(gt_q[i]).T @ quat_to_rot(gt_q[j])
        Re = quat_to_rot(est_q[i]).T @ quat_to_rot(est_q[j])
        dR = Rg.T @ Re
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        rerrs.append(ang)
    terrs, rerrs = np.asarray(terrs), np.asarray(rerrs)
    return {
        "trans_rmse": float(np.sqrt((terrs ** 2).mean())) if len(terrs) else float("nan"),
        "rot_rmse_deg": float(np.sqrt((rerrs ** 2).mean())) if len(rerrs) else float("nan"),
        "pairs": int(len(terrs)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gt", help="ground truth TUM file")
    p.add_argument("est", help="estimated TUM file")
    p.add_argument("--delta", type=float, default=1.0, help="RPE delta [s]")
    p.add_argument("--format", default="tum", choices=["tum", "kitti"],
                   help="kitti: both files are row-major 3x4 pose lines "
                   "(fast_gicp/src/kitti.cpp output + KITTI poses.txt)")
    args = p.parse_args()
    load = load_tum if args.format == "tum" else load_kitti
    gt_t, gt_p, gt_q = load(args.gt)
    et, ep, eq = load(args.est)
    ia, ib = associate(gt_t, et)
    if len(ia) < 2:
        print("no associations", file=sys.stderr)
        sys.exit(1)
    a = ate(gt_p[ia], ep[ib])
    r = rpe(gt_t[ia], gt_p[ia], gt_q[ia], et[ib], ep[ib], eq[ib], args.delta)
    print(f"ATE  rmse {a['rmse']:.4f} m  mean {a['mean']:.4f}  max {a['max']:.4f}  ({len(ia)} poses)")
    print(f"RPE@{args.delta}s  trans {r['trans_rmse']:.4f} m  rot {r['rot_rmse_deg']:.4f} deg  ({r['pairs']} pairs)")


if __name__ == "__main__":
    main()
