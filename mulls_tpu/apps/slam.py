"""mulls_slam-equivalent CLI: LiDAR odometry / SLAM over a scan folder.

Mirrors the reference driver's flags and outputs (`test/mulls_slam.cpp`):
pose files in KITTI 3x4 format (readable by kitti_eval.py / evo), a timing
report, and the built-in KITTI drift evaluation when ground truth is given.

Usage:
  python -m mulls_tpu.apps.slam \
      --point_cloud_folder /data/kitti/00/velodyne \
      --gt_body_pose_file_path /data/kitti/00/00.txt \
      --calib_file_path /data/kitti/00/calib.txt \
      --output_lo_body_pose_file_path out/pose_b_lo.txt \
      --flagfile script/config/lo_gflag_list_kitti_urban.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from mulls_tpu.config import MullsConfig, gflag_bool, load_flagfile
from mulls_tpu.eval import kitti_metrics
from mulls_tpu.io import kitti as kitti_io
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.pipeline.odometry import OdometryPipeline
from mulls_tpu.pipeline.slam import SlamPipeline


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--point_cloud_folder", required=True)
    p.add_argument("--pc_format", default=None, help=".pcd | .bin | ...")
    p.add_argument("--flagfile", default=None)
    p.add_argument("--frame_num_begin", type=int, default=0)
    p.add_argument("--frame_num_end", type=int, default=None)
    p.add_argument("--frame_step", type=int, default=1)
    p.add_argument("--gt_body_pose_file_path", default=None)
    p.add_argument("--gt_oxts_format", type=gflag_bool, nargs="?", const=1, default=0,
                   help="gt poses are tx ty tz qx qy qz qw lines "
                        "(`dataio.hpp:2003-2040`) instead of KITTI 3x4")
    p.add_argument("--gt_in_lidar_frame", type=gflag_bool, nargs="?", const=1, default=0,
                   help="gt poses are already in the LiDAR frame "
                        "(no calib applied, `mulls_slam.cpp:301-314`)")
    p.add_argument("--output_gt_lidar_pose_file_path", default=None)
    p.add_argument("--lo_lidar_pose_point_cloud", default=None,
                   help="write the estimated trajectory as a .pcd "
                        "(`dataio.hpp:2105-2123`)")
    p.add_argument("--gt_lidar_pose_point_cloud", default=None)
    p.add_argument("--calib_file_path", default=None)
    p.add_argument("--output_adjacent_lo_pose_file_path", default=None)
    p.add_argument("--output_lo_body_pose_file_path", default=None)
    p.add_argument("--output_lo_lidar_pose_file_path", default=None)
    p.add_argument("--timing_report_file", default=None)
    p.add_argument("--evaluation_file", default=None)
    p.add_argument("--progress", action="store_true")
    p.add_argument("--loop_closure_detection_on", type=gflag_bool,
                   default=None,
                   help="override the flagfile's loop-closure switch (0|1)")
    p.add_argument("--baseline_reg_method", default="",
                   help="replace MULLS-ICP with a baseline: ndt | gicp")
    p.add_argument("--semantic_kitti_label_folder", default=None,
                   help="Semantic-KITTI .label folder (enables the "
                        "semantic-assisted extraction path)")
    p.add_argument("--output_map_pcd", default=None,
                   help="write the merged, outlier-filtered map cloud")
    p.add_argument("--write_out_map_on", type=gflag_bool, nargs="?", const=1, default=0,
                   help="write the merged map into "
                        "--output_map_point_cloud_folder_path/merged_map.pcd "
                        "(`mulls_slam.cpp:46,959-1028`)")
    p.add_argument("--map_downrate_output", type=int, default=1,
                   help="per-frame point stride for the output map "
                        "(`--map_downrate_output`, `mulls_slam.cpp:49,970`; "
                        "the assembled map is additionally voxel-thinned "
                        "by --map_voxel_size)")
    p.add_argument("--constraint_output_file", default=None,
                   help="dump the pose-graph edges in the reference's "
                        "constraint-file format (`dataio.hpp:1247-1337`)")
    p.add_argument("--write_out_gt_map_on", type=gflag_bool, nargs="?", const=1, default=0,
                   help="assemble the map with gt poses instead of the "
                        "estimated ones (`--write_out_gt_map_on`)")
    p.add_argument("--write_map_each_frame", type=gflag_bool, nargs="?", const=1, default=0,
                   help="write each registered frame as its own pcd into "
                        "--output_map_point_cloud_folder_path")
    p.add_argument("--output_map_point_cloud_folder_path",
                   default="map_out")
    p.add_argument("--map_filter_on", type=gflag_bool, default=1,
                   help="radius-outlier filter the assembled map (0|1)")
    p.add_argument("--output_map_bev", default=None,
                   help="write a birds-eye height image of the map")
    p.add_argument("--output_map_html", default=None,
                   help="write a standalone interactive WebGL viewer "
                        "(map + trajectory + pose-graph overlay — the "
                        "headless MapViewer replacement)")
    p.add_argument("--map_voxel_size", type=float, default=0.25)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax profiler trace of the run")
    p.add_argument("--export_feature_frame", type=int, default=None,
                   help="dump this frame's per-class feature clouds as pcd "
                        "(headless MapViewer replacement)")
    p.add_argument("--export_feature_dir", default="feature_out")
    p.add_argument("--checkpoint_path", default=None,
                   help="checkpoint file for save/resume (SLAM mode)")
    p.add_argument("--map_snapshot_dir", default=None,
                   help="write a WebGL+BEV snapshot of the live map / "
                        "trajectory / pose graph here every N submaps "
                        "(during-run observability for long headless "
                        "runs; the reference's live MapViewer role)")
    p.add_argument("--map_snapshot_every_submaps", type=int, default=4)
    return p


def _export_features(ds, cfg, frame_idx: int, out_dir: str) -> None:
    """Per-class feature-cloud pcd export — the headless stand-in for the
    reference's feature-map viewer window (`map_viewer.h:101-224`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mulls_tpu.core.cloud import RawCloud
    from mulls_tpu.frontend.features import extract_features
    from mulls_tpu.io.pcd import write_pcd

    f = ds[frame_idx]
    raw = RawCloud(xyz=jnp.asarray(f["xyz"]),
                   intensity=jnp.asarray(f["intensity"]),
                   ts_ratio=jnp.asarray(f["ts_ratio"]),
                   mask=jnp.asarray(f["mask"]),
                   label=(jnp.asarray(f["label"]) if "label" in f else None))
    frame = jax.jit(extract_features, static_argnames=("cfg",))(
        raw, cfg, jax.random.key(0))
    os.makedirs(out_dir, exist_ok=True)
    all_xyz, all_cls, all_i = [], [], []
    from mulls_tpu.viz.html_viewer import CLASS_NAMES
    for name, cloud in frame.full.items():
        m = np.asarray(cloud.mask)
        write_pcd(os.path.join(out_dir, f"{frame_idx:06d}_{name}.pcd"),
                  np.asarray(cloud.xyz)[m],
                  intensity=np.asarray(cloud.intensity)[m],
                  normals=np.asarray(cloud.normal)[m])
        print(f"[mulls_tpu] {name}: {int(m.sum())} pts")
        all_xyz.append(np.asarray(cloud.xyz)[m])
        all_cls.append(np.full(int(m.sum()), CLASS_NAMES.index(name)
                               if name in CLASS_NAMES else 0, np.uint8))
        all_i.append(np.asarray(cloud.intensity)[m])
    # interactive single-frame feature view (class-colored WebGL)
    from mulls_tpu.viz import export_html_viewer
    export_html_viewer(
        os.path.join(out_dir, f"{frame_idx:06d}_features.html"),
        np.concatenate(all_xyz), np.concatenate(all_cls),
        np.concatenate(all_i), title=f"frame {frame_idx} features")


def main(argv=None) -> int:
    args, extra = build_parser().parse_known_args(argv)
    cfg = (load_flagfile(args.flagfile) if args.flagfile else MullsConfig())
    if extra:  # gflags parity: any --name=value accepted on the CLI
        from mulls_tpu.config import apply_flag_overrides
        cfg = apply_flag_overrides(cfg, extra)

    import dataclasses
    if args.semantic_kitti_label_folder:
        from mulls_tpu.io.dataset import SemanticKittiDataset
        ds = SemanticKittiDataset(
            args.point_cloud_folder, args.semantic_kitti_label_folder,
            cfg.shapes.n_raw, begin=args.frame_num_begin,
            end=args.frame_num_end, step=args.frame_step)
        cfg = dataclasses.replace(cfg, feature=dataclasses.replace(
            cfg.feature, semantic_assist_on=True))
    else:
        ds = FolderDataset(args.point_cloud_folder, cfg.shapes.n_raw,
                           ext=args.pc_format, begin=args.frame_num_begin,
                           end=args.frame_num_end, step=args.frame_step)
    print(f"[mulls_tpu] {len(ds)} frames from {args.point_cloud_folder}")

    if args.loop_closure_detection_on is not None:
        cfg = dataclasses.replace(cfg, submap=dataclasses.replace(
            cfg.submap,
            loop_closure_detection_on=bool(args.loop_closure_detection_on)))

    # baseline odometry back-ends (`--baseline_reg_method`, NDT / VGICP)
    if args.baseline_reg_method:
        cfg = dataclasses.replace(cfg, baseline=dataclasses.replace(
            cfg.baseline, method=args.baseline_reg_method))

    # with the back-end on, run the full SLAM pipeline (submaps + loop
    # closure + PGO, `mulls_slam.cpp:451-628`); otherwise the leaner
    # pure-odometry streaming loop
    if args.export_feature_frame is not None:
        _export_features(ds, cfg, args.export_feature_frame,
                         args.export_feature_dir)

    prof = None
    if args.profile_dir:
        import jax
        prof = jax.profiler.trace(args.profile_dir)
        prof.__enter__()

    if cfg.baseline.method:
        from mulls_tpu.pipeline.baseline import BaselinePipeline
        pipe = BaselinePipeline(cfg)
        res = pipe.run(ds, progress=args.progress)
    elif cfg.submap.loop_closure_detection_on:
        pipe = SlamPipeline(cfg, checkpoint_path=args.checkpoint_path,
                            snapshot_dir=args.map_snapshot_dir,
                            snapshot_every=args.map_snapshot_every_submaps)
        res = pipe.run(ds, progress=args.progress,
                       stage_timing=args.timing_report_file is not None)
        backend = getattr(res, "backend", None)
        if backend is not None:
            print(f"[mulls_tpu] back-end: {len(backend.submaps)} submaps, "
                  f"{len(backend.edges)} edges, "
                  f"{sum(1 for e in backend.edges if e.kind == 2)} reg edges")
            # end-of-run inner-submap refinement (`mulls_slam.cpp:876-927`)
            pipe.refine(res)
    else:
        pipe = OdometryPipeline(cfg)
        res = pipe.run(ds, progress=args.progress,
                       profile=args.timing_report_file is not None)

    if prof is not None:
        prof.__exit__(None, None, None)
        print(f"[mulls_tpu] profiler trace written to {args.profile_dir}")

    poses_lidar = res.poses
    if args.output_lo_lidar_pose_file_path:
        os.makedirs(os.path.dirname(args.output_lo_lidar_pose_file_path)
                    or ".", exist_ok=True)
        kitti_io.write_kitti_poses(args.output_lo_lidar_pose_file_path,
                                   poses_lidar)
    if args.output_adjacent_lo_pose_file_path:
        adj = np.einsum("nij,njk->nik",
                        np.linalg.inv(poses_lidar[:-1]), poses_lidar[1:])
        kitti_io.write_kitti_poses(args.output_adjacent_lo_pose_file_path, adj)

    calib = (kitti_io.read_kitti_calib(args.calib_file_path)
             if args.calib_file_path else np.eye(4))
    poses_body = kitti_io.uncalibrate(poses_lidar, calib)
    if args.output_lo_body_pose_file_path:
        os.makedirs(os.path.dirname(args.output_lo_body_pose_file_path)
                    or ".", exist_ok=True)
        kitti_io.write_kitti_poses(args.output_lo_body_pose_file_path,
                                   poses_body)

    if args.timing_report_file and res.timings is not None:
        np.savetxt(args.timing_report_file, res.timings, fmt="%.3f",
                   header="feature_ms map_ms reg_ms loop_ms")
    if res.timings is not None:
        t = res.timings[1:]
        print(f"[mulls_tpu] mean per-frame: total {t.sum(1).mean():.1f} ms "
              f"(feature {t[:, 0].mean():.1f} | map {t[:, 1].mean():.1f} | "
              f"reg {t[:, 2].mean():.1f} | loop {t[:, 3].mean():.1f})")

    gt_body = gt_lidar = None
    if args.gt_body_pose_file_path:
        gt_body = (kitti_io.read_pose_quat(args.gt_body_pose_file_path)
                   if args.gt_oxts_format
                   else kitti_io.read_kitti_poses(args.gt_body_pose_file_path))
        gt_body = np.einsum("ij,njk->nik", np.linalg.inv(gt_body[0]), gt_body)
        gt_lidar = (gt_body if args.gt_in_lidar_frame
                    else kitti_io.apply_calibration(gt_body, calib))
        if args.output_gt_lidar_pose_file_path:
            kitti_io.write_kitti_poses(args.output_gt_lidar_pose_file_path,
                                       gt_lidar)

    # trajectory-as-pointcloud export (`dataio.hpp:2105-2123`)
    from mulls_tpu.io.pcd import write_pcd
    if args.lo_lidar_pose_point_cloud:
        write_pcd(args.lo_lidar_pose_point_cloud,
                  poses_lidar[:, :3, 3].astype(np.float32))
    if args.gt_lidar_pose_point_cloud and gt_lidar is not None:
        write_pcd(args.gt_lidar_pose_point_cloud,
                  gt_lidar[:, :3, 3].astype(np.float32))

    # constraint-file dump (`dataio.hpp:1247-1337` format)
    backend = getattr(res, "backend", None)
    if args.constraint_output_file:
        if backend is not None:
            from mulls_tpu.io.constraints import write_constraint_file
            n_con = write_constraint_file(args.constraint_output_file,
                                          backend.edges)
            print(f"[mulls_tpu] {n_con} constraints -> "
                  f"{args.constraint_output_file}")
        else:
            print("[mulls_tpu] constraint output requested but no pose "
                  "graph was built (enable --loop_closure_detection_on)")

    if args.write_out_map_on and not args.output_map_pcd:
        os.makedirs(args.output_map_point_cloud_folder_path, exist_ok=True)
        args.output_map_pcd = os.path.join(
            args.output_map_point_cloud_folder_path, "merged_map.pcd")
    if (args.output_map_pcd or args.output_map_bev or args.output_map_html
            or args.write_map_each_frame):
        from mulls_tpu.mapping.assembly import (accumulate_map,
                                                radius_outlier_filter,
                                                write_map_outputs)
        map_poses = (gt_lidar if (args.write_out_gt_map_on
                                  and gt_lidar is not None) else poses_lidar)
        if args.write_map_each_frame:
            # per-frame registered clouds (`--write_map_each_frame`)
            os.makedirs(args.output_map_point_cloud_folder_path,
                        exist_ok=True)
            for i in range(min(len(ds), len(map_poses))):
                d = ds[i]
                xyz = d["xyz"][d["mask"]]
                if args.map_downrate_output > 1:
                    xyz = xyz[::args.map_downrate_output]
                T = map_poses[i]
                moved = xyz @ T[:3, :3].T.astype(np.float32) \
                    + T[:3, 3].astype(np.float32)
                write_pcd(os.path.join(
                    args.output_map_point_cloud_folder_path,
                    f"{i:06d}.pcd"), moved)
        if args.output_map_pcd or args.output_map_bev or args.output_map_html:
            pts = accumulate_map(ds, map_poses,
                                 voxel_res=args.map_voxel_size,
                                 downrate=args.map_downrate_output)
            if args.map_filter_on:
                pts = radius_outlier_filter(pts)
            write_map_outputs(pts, args.output_map_pcd, args.output_map_bev)
            print(f"[mulls_tpu] map assembled: {len(pts)} points")
            if args.output_map_html:
                from mulls_tpu.viz import export_html_viewer
                # pose-graph edges anchored at each submap's first frame
                traj = map_poses[:, :3, 3]
                edges = None
                if backend is not None and backend.edges:
                    anchor = [min(s.frame_begin, len(traj) - 1)
                              for s in backend.submaps]
                    edges = [(anchor[e.i], anchor[e.j], e.kind)
                             for e in backend.edges if e.kind >= 1]
                n_emb = export_html_viewer(
                    args.output_map_html, pts, trajectory=traj, edges=edges,
                    title=os.path.basename(args.point_cloud_folder or "run"))
                print(f"[mulls_tpu] viewer ({n_emb} pts) -> "
                      f"{args.output_map_html}")

    if gt_body is not None:
        m = min(len(gt_body), len(poses_body))
        errs = kitti_metrics.compute_error(gt_body[:m], poses_body[:m])
        summary = kitti_metrics.summarize(errs)
        print(kitti_metrics.format_report(summary))
        if args.evaluation_file:
            with open(args.evaluation_file, "w") as f:
                json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
