#!/usr/bin/env python
"""Prior-map localization runner — the localization/new_localization node role.

Behavioral parity target: `src/jueying_slam/src/localization.cpp`
  - dynamic tile-map loading around the pose (`dynamic_load_map_run` :281-315
    + dynamic_map.h): tiles are re-selected when the robot moves, cropped to
    1.1x max_range, and rebuilt into the device maps,
  - `Matching_method` switch loam|ndt (:317-340, :991),
  - fitness gating + relocalize-from-initialPose + lose flag (:424-476),
  - GPS initialization with covariance gate (`gpsHandler` :499),
  - the status channel: fitness/eigen exported per frame the way the
    reference abuses odometry covariance[0:2] (localization.cpp:1243-1244).

Inputs: --map_dir with arealist.csv + tile PCDs (or --map_pcd single map),
frames from --data_dir (frame_%06d.pcd) or --synthetic N. Outputs: TUM
trajectory + status.csv (t, fitness, matched_frac, lost, max_eigen).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--map_dir", default="", help="tile map dir with arealist.csv")
    p.add_argument("--map_pcd", default="", help="single prior map PCD")
    p.add_argument("--feature_map_dir", default="", help="corner/surf feature tile map dir "
                   "(construct_full_map --feature_maps): enables the feature-based LOAM path "
                   "(the globalCornerMap/globalSurfMap products new_localization.cpp:309-321 "
                   "loads); implies --method loam")
    p.add_argument("--data_dir", default="")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--method", default="ndt", choices=["loam", "ndt"])
    p.add_argument("--init_pose", default="0,0,0,0", help="x,y,z,yaw initial pose")
    p.add_argument("--gps_init", default="", help="x,y,z[,cov] GPS init (cov gate 0.003, gpsHandler :499)")
    p.add_argument("--ukf_odom", default="", help="CSV of external UKF odometry rows "
                   "(t,x,y,z,qw,qx,qy,qz): refreshes the relocalization pose (UKFHandler :482)")
    p.add_argument("--lever_arm", default="0,0,0", help="Pil lidar-in-body lever arm (m)")
    p.add_argument("--out_dir", default="loc_out")
    p.add_argument("--n_points", type=int, default=8192)
    p.add_argument("--n_corner", type=int, default=512, help="LOAM corner-channel budget")
    p.add_argument("--n_surf", type=int, default=2048, help="LOAM surf-channel budget")
    p.add_argument("--n_scan", type=int, default=16, help="range-image rings (N_SCAN)")
    p.add_argument("--horizon", type=int, default=1800, help="range-image columns (Horizon_SCAN)")
    p.add_argument("--fov_up", type=float, default=15.0)
    p.add_argument("--fov_down", type=float, default=-15.0)
    p.add_argument("--max_range", type=float, default=50.0)
    p.add_argument("--update_map_dist", type=float, default=10.0, help="re-tile when moved this far")
    p.add_argument("--tile_margin", type=float, default=100.0)
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(p)
    return p.parse_args()


class TileMapLoader:
    """Host-side stand-in for the dynamic map-load thread: keeps the device
    maps built from the tiles around the current position."""

    def __init__(self, args, cfg):
        from pointcloud_slam_tpu.io import pcd as pcdio

        self.args = args
        self.cfg = cfg
        self.pcdio = pcdio
        self.last_xy = None
        self.areas = None
        self.single = None
        if args.map_dir:
            self.areas = pcdio.read_arealist(os.path.join(args.map_dir, "arealist.csv"))
        # feature tile maps (corner/surf families — the globalCornerMap /
        # globalSurfMap tile products, new_localization.cpp:309-321)
        self.feat_areas = None
        if args.feature_map_dir:
            self.feat_areas = {}
            for fam in ("corner", "surf"):
                path = os.path.join(args.feature_map_dir, f"{fam}_arealist.csv")
                self.feat_areas[fam] = pcdio.read_arealist(path) if os.path.exists(path) else []
        self.maps = None
        self.feat_maps = None

    def _crop(self, cloud, x, y):
        # crop to 1.1 x max_range around the pose (dynamic_load_map :256-280)
        r = 1.1 * self.args.max_range
        sel = (np.abs(cloud[:, 0] - x) < r) & (np.abs(cloud[:, 1] - y) < r)
        return cloud[sel] if sel.any() else cloud[:1]

    def _gather_tiles(self, areas, base_dir, x, y):
        tiles = self.pcdio.tiles_for_position(areas, x, y, margin=self.args.tile_margin)
        clouds = [self.pcdio.read_pcd_xyz(os.path.join(base_dir, a["path"])) for a in tiles]
        return np.concatenate(clouds) if clouds else np.zeros((1, 3), np.float32)

    def maybe_update_features(self, x, y):
        """Device corner/surf maps from the feature tiles around (x, y)."""
        if (self.last_xy is not None and self.feat_maps is not None
                and np.hypot(x - self.last_xy[0], y - self.last_xy[1]) < self.args.update_map_dist):
            return self.feat_maps
        self.last_xy = (x, y)
        from pointcloud_slam_tpu import ops

        maps = {}
        for fam, grid_cfg in (("corner", self.cfg.scan2map.corner_grid),
                              ("surf", self.cfg.scan2map.surf_grid)):
            cloud = self._gather_tiles(self.feat_areas[fam], self.args.feature_map_dir, x, y) \
                if self.feat_areas[fam] else np.zeros((1, 3), np.float32)
            cloud = self._crop(cloud.astype(np.float32), x, y)
            pts = jnp.asarray(np.ascontiguousarray(cloud.T))
            grid = ops.create(grid_cfg, dtype=pts.dtype)
            maps[fam] = ops.insert(grid_cfg, grid, pts, jnp.ones(pts.shape[1], bool))
        self.feat_maps = (maps["corner"], maps["surf"])
        return self.feat_maps

    def maybe_update(self, x, y):
        if self.last_xy is not None and np.hypot(x - self.last_xy[0], y - self.last_xy[1]) < self.args.update_map_dist and self.maps is not None:
            return self.maps
        self.last_xy = (x, y)
        if self.areas is not None:
            cloud = self._gather_tiles(self.areas, self.args.map_dir, x, y)
        else:
            if self.single is None:
                self.single = self.pcdio.read_pcd_xyz(self.args.map_pcd)
            cloud = self.single
        cloud = self._crop(cloud.astype(np.float32), x, y)
        self.maps = self._build(cloud)
        return self.maps

    def _build(self, cloud):
        from pointcloud_slam_tpu import register

        pts = jnp.asarray(np.ascontiguousarray(cloud.T))
        # the LOAM path matches against cfg.scan2map.surf_grid, so the tile
        # map must be built with that exact grid config (static-arg identity)
        grid_cfg = self.cfg.scan2map.surf_grid
        _, point_map = register.build_target_map(pts, grid_cfg=grid_cfg)
        # baked: the tile map is built once per map update and queried every
        # frame — the stencil-baked layout (gg.bake) pays its one-time build
        # for a ~nearby x cheaper gather phase per localization solve
        ndt_grid, ndt_map = register.ndt.build_target(
            self.cfg.ndt, pts, capacity=1 << 15, baked=True)
        return grid_cfg, point_map, ndt_grid, ndt_map


def main():
    args = parse_args()
    from pointcloud_slam_tpu.utils import runtime
    runtime.select_platform(args.platform)
    from pointcloud_slam_tpu.geom import se3, so3
    from pointcloud_slam_tpu.models.localization import pipeline as loc
    from pointcloud_slam_tpu.utils import checkpoint as ck

    os.makedirs(args.out_dir, exist_ok=True)
    if args.feature_map_dir:
        args.method = "loam"
    cfg = loc.LocalizationConfig(method=args.method)
    if args.feature_map_dir:
        # feature tile maps are rebuilt once per map update and queried every
        # frame — the stencil-baked layout wins there (same rationale as the
        # baked NDT tile map below; 27.9 -> 19.6 ms/solve on v5e)
        import dataclasses as _dc
        from pointcloud_slam_tpu.models.liosam import scan2map as _s2m
        cfg = _dc.replace(cfg, scan2map=_dc.replace(
            cfg.scan2map,
            corner_grid=_s2m.baked_grid(cfg.scan2map.corner_grid),
            surf_grid=_s2m.baked_grid(cfg.scan2map.surf_grid),
        ))

    from pointcloud_slam_tpu.io import odom_feed

    lever = tuple(float(v) for v in args.lever_arm.split(","))
    x0, y0, z0, yaw0 = (float(v) for v in args.init_pose.split(","))
    if args.gps_init:
        vals = [float(v) for v in args.gps_init.split(",")]
        cov = vals[3] if len(vals) > 3 else 0.0
        pos = odom_feed.gps_init_position(vals[:3], (cov, cov), lever_arm=lever)
        if pos is not None:  # covariance gate (localization.cpp gpsHandler :499-520)
            x0, y0, z0 = (float(v) for v in pos)
            print(f"GPS init accepted: ({x0:.2f}, {y0:.2f}, {z0:.2f})")
        else:
            print(f"GPS init REJECTED (cov {cov} >= {odom_feed.GPS_COV_GATE})")
    ukf = odom_feed.UkfOdomFeed.from_csv(args.ukf_odom, lever_arm=lever) if args.ukf_odom else None
    init = se3.Pose(
        so3.exp(jnp.asarray([0.0, 0.0, yaw0], jnp.float32)), jnp.asarray([x0, y0, z0], jnp.float32)
    )

    loader = TileMapLoader(args, cfg)

    # in-loop LOAM front end: range-image projection + feature extraction,
    # the imageProjection/featureExtraction stages new_localization runs
    # before corner/surf matching (new_localization.cpp:77-2081)
    from pointcloud_slam_tpu.models.liosam import features as feats_mod
    from pointcloud_slam_tpu.models.liosam import projection as proj_mod

    pcfg = proj_mod.ProjectionConfig(n_scan=args.n_scan, horizon=args.horizon,
                                     fov_up_deg=args.fov_up, fov_down_deg=args.fov_down,
                                     min_range=0.5)
    fcfg = feats_mod.FeatureConfig()

    @jax.jit
    def front_end(pts, mask):
        img = proj_mod.project(pcfg, pts, mask)
        fs = feats_mod.extract(fcfg, img)
        cpts, cmask = feats_mod.gather_features(img, fs.edge_mask)
        spts, smask = feats_mod.gather_features(img, fs.surf_mask)
        return cpts, cmask, spts, smask

    def fixed(pts, mask, n):
        """Top-n masked points into a fixed-shape (3, n) cloud."""
        idx = np.argsort(~np.asarray(mask))[:n]
        out = np.zeros((3, n), np.float32)
        m = np.zeros(n, bool)
        sel = np.asarray(mask)[idx]
        out[:, : sel.sum()] = np.asarray(pts)[:, idx[sel]]
        m[: sel.sum()] = True
        return jnp.asarray(out), jnp.asarray(m)

    def frames():
        if args.synthetic:
            from pointcloud_slam_tpu.io import synthetic

            world = synthetic.make_room_cloud(60_000, seed=0)
            loader.single = world  # localize against the same world
            loader.areas = None
            rng = np.random.default_rng(1)
            for k in range(args.synthetic):
                t = np.array([0.1 * k, 0.05 * k, 0.0], np.float32)
                sel = rng.choice(len(world), args.n_points, replace=False)
                yield k * 0.1, (world[sel] - t).astype(np.float32), t
        else:
            from pointcloud_slam_tpu.io import pcd as pcdio

            files = sorted(f for f in os.listdir(args.data_dir) if f.startswith("frame_") and f.endswith(".pcd"))
            for k, name in enumerate(files):
                yield k * 0.1, pcdio.read_pcd_xyz(os.path.join(args.data_dir, name)), None

    pose = init
    rows = []
    times, poss, quats = [], [], []
    t_start = time.perf_counter()
    n = 0
    for stamp, pts, _gt in frames():
        P = args.n_points
        buf = np.zeros((3, P), np.float32)
        m = np.zeros(P, bool)
        k = min(len(pts), P)
        buf[:, :k] = pts[:k].T
        m[:k] = True
        pj, mj = jnp.asarray(buf), jnp.asarray(m)

        x, y = float(pose.t[0]), float(pose.t[1])

        if args.method == "ndt":
            grid_cfg, point_map, ndt_grid, ndt_map = loader.maybe_update(x, y)
            res = loc.localize_ndt(cfg, ndt_grid, ndt_map, grid_cfg, point_map, pj, mj, pose)
        elif args.feature_map_dir:
            # feature-based LOAM: in-loop projection + extraction, corner
            # features against the corner tile map, surf against the surf map
            corner_map, surf_map = loader.maybe_update_features(x, y)
            cpts, cmask, spts, smask = front_end(pj, mj)
            c, cm = fixed(cpts, cmask, args.n_corner)
            s, sm = fixed(spts, smask, args.n_surf)
            res = loc.localize_loam(cfg, None, corner_map, surf_map, c, cm, s, sm, pose)
        else:
            from pointcloud_slam_tpu import ops

            # LOAM mode against a raw tile map: surf-plane matching only
            # (corner channel empty — raw tiles carry no feature split)
            grid_cfg, point_map, ndt_grid, ndt_map = loader.maybe_update(x, y)
            empty_corner = ops.create(cfg.scan2map.corner_grid)
            no_c = jnp.zeros((3, 8), jnp.float32)
            no_cm = jnp.zeros(8, bool)
            res = loc.localize_loam(cfg, grid_cfg, empty_corner, point_map, no_c, no_cm, pj, mj, pose)
        # on loss restart from initialPose; when a UKF stream is present, the
        # fallback is the LATEST lever-arm-corrected UKF pose (UKFHandler :482
        # feeding the relocalization block :441-476)
        fallback = init
        if ukf is not None:
            got = ukf.initial_pose_at(stamp)
            if got is not None:
                upos, uyaw = got
                fallback = se3.Pose(
                    so3.exp(jnp.asarray([0.0, 0.0, uyaw], jnp.float32)), jnp.asarray(upos)
                )
        pose = loc.relocalize(res, fallback)
        lost = bool(res.lost)
        rows.append((stamp, float(res.fitness), float(res.matched_frac), int(lost), float(res.max_eigen)))
        times.append(stamp)
        poss.append(np.asarray(pose.t))
        quats.append(np.asarray(so3.to_quat(pose.R)))
        n += 1

    wall = time.perf_counter() - t_start
    print(f"frames: {n}  wall: {wall:.1f}s  FPS: {n / max(wall, 1e-9):.2f}  "
          f"lost: {sum(r[3] for r in rows)}")
    with open(os.path.join(args.out_dir, "status.csv"), "w") as f:
        f.write("t,fitness,matched_frac,lost,max_eigen\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    ck.save_trajectory_tum(os.path.join(args.out_dir, "traj_tum.txt"), times, poss, quats)
    print(f"outputs -> {args.out_dir}/ (traj_tum.txt, status.csv)")


if __name__ == "__main__":
    main()
