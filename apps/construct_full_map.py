#!/usr/bin/env python
"""Offline full-map reconstruction from saved keyframes + poses.

Behavioral parity target:
  - `scripts/construct_full_map.sh:1-10` (offline keyframes + poses -> full
    map PCD; the jueying_pgo/dynamic_map product path),
  - `src/tool/occupancy_mapping` `OccupancyServerFromFile` (:384-622):
    keyframe PCDs + pose file -> occupancy grid map(s) saved as PGM/YAML.

Inputs: a directory of `key_%06d.pcd` + `poses_kitti.txt` (row-major 3x4 per
line). Outputs: full cloud PCD (voxel-downsampled) and optionally the 2-D
occupancy map.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("keyframe_dir")
    p.add_argument("--poses", default="poses_kitti.txt")
    p.add_argument("--out", default="full_map.pcd")
    p.add_argument("--leaf", type=float, default=0.2)
    p.add_argument("--occupancy", default="", help="also save occupancy map at this path prefix")
    p.add_argument("--occ_size", type=int, default=1024)
    p.add_argument("--occ_res", type=float, default=0.1)
    p.add_argument("--floor_labels", default="", help="file with one integer floor label per "
                   "keyframe: one occupancy map per floor (OccupancyServerFromFile :445-595; "
                   "label 0 saves without a suffix, negative labels are skipped)")
    p.add_argument("--bt", default="", help="also save a 3-D octomap .bt octree at this path "
                   "(octomap_server/octomap_saver artifact: per-keyframe beam carving from the "
                   "keyframe origin, OctomapServer::insertCloudCallback role)")
    p.add_argument("--bt_res", type=float, default=0.2)
    p.add_argument("--feature_maps", default="", help="also build corner/surf feature tile maps "
                   "at this directory (the globalCornerMap/globalSurfMap products that "
                   "new_localization.cpp:309-321 loads): requires Scans/%%06d.pcd + "
                   "%%06d_corner.pcd artifacts (run_slam_offline --save_artifacts)")
    p.add_argument("--tile", type=float, default=50.0, help="feature-map tile edge [m]")
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(p)
    args = p.parse_args()
    runtime.select_platform(args.platform)

    from pointcloud_slam_tpu import ops
    from pointcloud_slam_tpu.io import pcd as pcdio
    from pointcloud_slam_tpu.maps import occupancy

    poses = np.loadtxt(os.path.join(args.keyframe_dir, args.poses)).reshape(-1, 3, 4)
    frames = sorted(f for f in os.listdir(args.keyframe_dir) if f.startswith("key_") and f.endswith(".pcd"))
    if not frames and os.path.isdir(os.path.join(args.keyframe_dir, "Scans")):
        # run_slam_offline --save_artifacts layout: Scans/%06d.pcd keyframe
        # surf clouds (the saveKeyFramesAndFactor product, :1868-1880)
        frames = sorted(
            os.path.join("Scans", f)
            for f in os.listdir(os.path.join(args.keyframe_dir, "Scans"))
            if f.endswith(".pcd") and "_corner" not in f
        )
    assert len(frames) <= len(poses), f"{len(frames)} keyframes but {len(poses)} poses"

    clouds = []
    for k, name in enumerate(frames):
        pts = pcdio.read_pcd_xyz(os.path.join(args.keyframe_dir, name))
        R, t = poses[k, :, :3], poses[k, :, 3]
        clouds.append(pts @ R.T + t)
    world = np.concatenate(clouds).astype(np.float32)
    print(f"{len(frames)} keyframes -> {len(world)} points")

    # device voxel downsample in chunks of fixed shape
    CH = 1 << 18
    kept = []
    ds = jax.jit(lambda p, m: ops.voxel_downsample(p, m, args.leaf))
    for i in range(0, len(world), CH):
        chunk = world[i : i + CH]
        pad = CH - len(chunk)
        arr = jnp.asarray(np.concatenate([chunk, np.zeros((pad, 3), np.float32)]).T)
        mask = jnp.asarray(np.concatenate([np.ones(len(chunk), bool), np.zeros(pad, bool)]))
        out, om = ds(arr, mask)
        out, om = np.asarray(out).T, np.asarray(om)
        kept.append(out[om])
    full = np.concatenate(kept)
    # second pass to dedup across chunk boundaries
    if len(kept) > 1 and len(full) <= CH:
        pad = CH - len(full)
        arr = jnp.asarray(np.concatenate([full, np.zeros((pad, 3), np.float32)]).T)
        mask = jnp.asarray(np.concatenate([np.ones(len(full), bool), np.zeros(pad, bool)]))
        out, om = ds(arr, mask)
        full = np.asarray(out).T[np.asarray(om)]
    pcdio.write_pcd(args.out, full)
    print(f"full map ({len(full)} pts after {args.leaf} m leaf) -> {args.out}")

    if args.feature_maps:
        # corner/surf feature tile maps from the per-keyframe feature
        # artifacts: each family is accumulated in world frame, split into
        # --tile m AABB tiles, and indexed by an arealist.csv — the exact
        # products `new_localization` consumes (read_arealist + create_pcd,
        # new_localization.cpp:309-321, dynamic_map.h:16-187)
        scans_dir = os.path.join(args.keyframe_dir, "Scans")
        fams = {"surf": "%06d.pcd", "corner": "%06d_corner.pcd"}
        os.makedirs(args.feature_maps, exist_ok=True)
        for fam, pat in fams.items():
            fam_clouds = []
            for k in range(len(frames)):
                path = os.path.join(scans_dir, pat % k)
                if not os.path.exists(path):
                    continue
                pts = pcdio.read_pcd_xyz(path)
                if len(pts) == 0:
                    continue
                R, t = poses[k, :, :3], poses[k, :, 3]
                fam_clouds.append(pts @ R.T + t)
            if not fam_clouds:
                print(f"feature maps: no {fam} artifacts found, skipped")
                continue
            w = np.concatenate(fam_clouds).astype(np.float32)
            T = args.tile
            tx = np.floor(w[:, 0] / T).astype(np.int64)
            ty = np.floor(w[:, 1] / T).astype(np.int64)
            rows = []
            for key in sorted(set(zip(tx.tolist(), ty.tolist()))):
                m = (tx == key[0]) & (ty == key[1])
                name = f"{fam}_{key[0]}_{key[1]}.pcd"
                pcdio.write_pcd(os.path.join(args.feature_maps, name), w[m])
                x0, y0 = key[0] * T, key[1] * T
                rows.append(f"{name},{x0},{y0},0,{x0 + T},{y0 + T},0")
            with open(os.path.join(args.feature_maps, f"{fam}_arealist.csv"), "w") as f:
                f.write("\n".join(rows) + "\n")
            print(f"{fam} feature map: {len(w)} pts, {len(rows)} tiles -> {args.feature_maps}")

    if args.occupancy:
        cfg = occupancy.OccupancyConfig(
            size=args.occ_size, resolution=args.occ_res, origin=-args.occ_size * args.occ_res / 2
        )
        step = jax.jit(lambda g, pts, m, xy: occupancy.insert_cloud(cfg, g, pts, m, xy, jnp.zeros(())))
        NP = 1 << 15

        # group keyframes by floor label (multi-floor offline maps,
        # OccupancyServerFromFile :445-595): each non-negative label builds its
        # own map; label 0 keeps the bare output name
        if args.floor_labels:
            labels = np.loadtxt(args.floor_labels, dtype=np.int64).reshape(-1)
            groups = {}
            for k in range(min(len(frames), len(labels))):
                if labels[k] >= 0:
                    groups.setdefault(int(labels[k]), []).append(k)
        else:
            groups = {0: list(range(len(frames)))}

        for label, idxs in sorted(groups.items()):
            grid = occupancy.create(cfg)
            for k in idxs:
                # reuse the world-frame cloud loaded above; chunked so large
                # scans are never truncated
                w = clouds[k].astype(np.float32)
                xy = jnp.asarray(poses[k, :, 3][:2], jnp.float32)
                for i in range(0, len(w), NP):
                    chunk = w[i : i + NP]
                    pad = NP - len(chunk)
                    arr = jnp.asarray(np.concatenate([chunk, np.zeros((pad, 3), np.float32)]).T)
                    mask = jnp.asarray(np.concatenate([np.ones(len(chunk), bool), np.zeros(pad, bool)]))
                    grid = step(grid, arr, mask, xy)
            out = args.occupancy + ("" if label == 0 else str(label))
            occupancy.save_pgm(cfg, grid, out)
            print(f"occupancy map (floor {label}, {len(idxs)} keyframes) -> {out}.pgm/.yaml")

    if args.bt:
        from pointcloud_slam_tpu.maps import octomap_io, tiled

        vcfg = tiled.VoxelOccConfig(capacity=1 << 20, resolution=args.bt_res)
        vmap = tiled.create_3d(vcfg)
        NP = 1 << 15
        ins = jax.jit(lambda m, pts, mask, o: tiled.insert_cloud_3d(vcfg, m, pts, mask, o))
        for k in range(len(frames)):
            # the world-frame keyframe cloud is already loaded above; insert
            # in fixed-shape chunks so large scans are never truncated
            w = clouds[k].astype(np.float32)
            origin = jnp.asarray(poses[k, :, 3], jnp.float32)
            for i in range(0, len(w), NP):
                chunk = w[i : i + NP]
                pad = NP - len(chunk)
                arr = jnp.asarray(np.concatenate([chunk, np.zeros((pad, 3), np.float32)]).T)
                mask = jnp.asarray(np.concatenate([np.ones(len(chunk), bool), np.zeros(pad, bool)]))
                vmap = ins(vmap, arr, mask, origin)
        n_nodes = octomap_io.save_bt(args.bt, vcfg, vmap)
        print(f"octomap .bt ({n_nodes} nodes, res {args.bt_res} m) -> {args.bt}")


if __name__ == "__main__":
    main()
