"""mulls_reg-equivalent CLI: pairwise point-cloud registration
(reference `test/mulls_reg.cpp:61-209`): load two clouds, extract features,
NCC keypoint matching, robust coarse registration (GNC / RANSAC), then
MULLS-ICP fine registration; writes the transformed source cloud and prints
the estimated transform + quality stats.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from mulls_tpu.config import MullsConfig, gflag_bool, load_flagfile


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--point_cloud_1_path", required=True, help="target")
    p.add_argument("--point_cloud_2_path", required=True, help="source")
    p.add_argument("--output_point_cloud_path", default=None)
    p.add_argument("--appro_coordinate_file", default=None,
                   help="4x4 initial guess, whitespace separated")
    p.add_argument("--flagfile", default=None)
    p.add_argument("--realtime_viewer_on", type=gflag_bool, nargs="?", const=1, default=0,
                   help="ignored (headless build)")
    p.add_argument("--coarse_reg",
                   choices=["gnc", "ransac", "fpfh", "bev", "yaw4dof",
                            "none"],
                   default=None,
                   help="coarse init: gnc (TEASER-style), ransac, fpfh "
                        "(SAC-IA), bev (global BEV correlation), yaw4dof "
                        "(brute-force heading sweep, "
                        "`cregistration.hpp:1584-1681`); default follows "
                        "--is_global_reg/--teaser_on like the reference, "
                        "with a BEV fallback when the fine stage rejects")
    p.add_argument("--is_global_reg", type=gflag_bool, default=1,
                   help="allow coarse registration without a good initial "
                        "guess (`test/mulls_reg.cpp:53`)")
    p.add_argument("--json_out", default=None)
    return p


def register_pair(cfg: MullsConfig, cloud_target: dict, cloud_source: dict,
                  coarse: str = "gnc", init_guess=None):
    """Full MULLS-Reg path on device. Returns (T 4x4 np, stats dict)."""
    import jax
    import jax.numpy as jnp
    from mulls_tpu.core.cloud import RawCloud
    from mulls_tpu.frontend.features import extract_features
    from mulls_tpu.frontend.icp import mm_lls_icp
    from mulls_tpu.backend.ncc import match_ncc
    from mulls_tpu.backend import coarse_reg as cr
    from mulls_tpu.io.dataset import pad_cloud

    def to_raw(d):
        p = pad_cloud(d, cfg.shapes.n_raw)
        return RawCloud(xyz=jnp.asarray(p["xyz"]),
                        intensity=jnp.asarray(p["intensity"]),
                        ts_ratio=jnp.asarray(p["ts_ratio"]),
                        mask=jnp.asarray(p["mask"]))

    extract = jax.jit(extract_features, static_argnames=("cfg",))

    # per-cloud downsample overrides (`--cloud_1_down_res` target /
    # `--cloud_2_down_res` source, `test/mulls_reg.cpp:29-30,80-81`)
    import dataclasses

    def side_cfg(res_override):
        if res_override is None or res_override < 0:
            return cfg
        return dataclasses.replace(cfg, preprocess=dataclasses.replace(
            cfg.preprocess, cloud_down_res=res_override))

    ft = extract(to_raw(cloud_target),
                 side_cfg(cfg.preprocess.cloud_1_down_res), jax.random.key(1))
    fs = extract(to_raw(cloud_source),
                 side_cfg(cfg.preprocess.cloud_2_down_res), jax.random.key(2))

    stats = {}
    T0 = jnp.eye(4, dtype=jnp.float32) if init_guess is None \
        else jnp.asarray(init_guess, jnp.float32)
    if coarse == "yaw4dof":
        # brute-force heading sweep over the full circle; no keypoint
        # matching needed (`mm_lls_icp_4dof_global`)
        from mulls_tpu.frontend.icp import mm_lls_icp_4dof_global
        res = mm_lls_icp_4dof_global(
            fs.down, ft.full, cfg.reg,
            heading_step_d=cfg.reg.heading_change_step_degree,
            max_iter=cfg.reg.reg_max_iter_num_s2s)
        stats.update({
            "sigma": float(res.sigma),
            "process_code": int(res.process_code),
            "confidence": float(res.confidence),
            "iterations": int(res.iterations),
        })
        return np.asarray(res.transform, np.float64), stats
    def bev_init():
        from mulls_tpu.backend.coarse_reg import (bev_feature_stack,
                                                  coarse_reg_bev)
        sx, sm = bev_feature_stack(fs.down)
        tx, tm = bev_feature_stack(ft.down)
        return coarse_reg_bev(sx, sm, tx, tm)

    if coarse == "bev":
        res_c = bev_init()
        stats["coarse_inliers"] = int(res_c.inlier_count)
        stats["coarse_valid"] = bool(res_c.valid)
        if bool(res_c.valid):
            T0 = res_c.transform
    elif coarse == "fpfh":
        # FPFH-SAC path (`cregistration.hpp:372-407`) on the downsampled
        # facade+ground geometry (normals come from the PCA pass)
        from mulls_tpu.backend.fpfh import coarse_reg_fpfhsac
        sx = jnp.concatenate([fs.down["facade"].xyz, fs.down["ground"].xyz])
        sn = jnp.concatenate([fs.down["facade"].normal,
                              fs.down["ground"].normal])
        sm = jnp.concatenate([fs.down["facade"].mask, fs.down["ground"].mask])
        tx = jnp.concatenate([ft.down["facade"].xyz, ft.down["ground"].xyz])
        tn = jnp.concatenate([ft.down["facade"].normal,
                              ft.down["ground"].normal])
        tm = jnp.concatenate([ft.down["facade"].mask, ft.down["ground"].mask])
        res_c, fitness = coarse_reg_fpfhsac(
            sx, sn, sm, tx, tn, tm, jax.random.key(3),
            search_radius=cfg.feature.cloud_pca_neigh_r,
            min_inlier_count=cfg.submap.teaser_min_inlier_count)
        stats["coarse_inliers"] = int(res_c.inlier_count)
        stats["coarse_valid"] = bool(res_c.valid)
        stats["fpfh_fitness"] = float(fitness)
        if bool(res_c.valid):
            T0 = res_c.transform
    elif coarse != "none":
        m = match_ncc(ft.descriptors, fs.descriptors,
                      fixed_num_corr=cfg.submap.best_n_feature_match_on,
                      corr_num=cfg.submap.feature_corr_num,
                      reciprocal=cfg.submap.reciprocal_feature_match_on)
        src_k = fs.down["vertex"].xyz[m.s_idx]
        tgt_k = ft.down["vertex"].xyz[m.t_idx]
        mask = m.valid & fs.down["vertex"].mask[m.s_idx] \
            & ft.down["vertex"].mask[m.t_idx]
        nb = cfg.feature.cloud_pca_neigh_r
        if coarse == "gnc":
            res_c = cr.coarse_reg_gnc(
                src_k, tgt_k, mask, jax.random.key(3), noise_bound=nb,
                min_inlier_count=cfg.submap.teaser_min_inlier_count)
        else:
            res_c = cr.coarse_reg_ransac(
                src_k, tgt_k, mask, jax.random.key(3), inlier_thre=2 * nb,
                min_inlier_count=cfg.submap.teaser_min_inlier_count)
        stats["coarse_inliers"] = int(res_c.inlier_count)
        stats["coarse_valid"] = bool(res_c.valid)
        if bool(res_c.valid):
            T0 = res_c.transform

    reg = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))
    res = reg(fs.down, ft.full, cfg.reg, T0,
              max_iter=cfg.reg.reg_max_iter_num_s2s)
    # descriptor matching degrades at wide baselines (NCC putative sets
    # can coherently prefer a wrong mode); when the fine stage rejects or
    # barely overlaps, retry from the global BEV-correlation basin
    if coarse in ("gnc", "ransac", "fpfh") and (
            int(res.process_code) != 1 or float(res.confidence) < 0.2):
        res_c = bev_init()
        if bool(res_c.valid):
            res2 = reg(fs.down, ft.full, cfg.reg, res_c.transform,
                       max_iter=cfg.reg.reg_max_iter_num_s2s)
            better = (int(res2.process_code) == 1
                      and float(res2.confidence) > float(res.confidence))
            if better:
                res = res2
                stats["coarse_inliers"] = int(res_c.inlier_count)
                stats["coarse_valid"] = bool(res_c.valid)
                stats["bev_fallback"] = True
    stats.update({
        "sigma": float(res.sigma),
        "process_code": int(res.process_code),
        "confidence": float(res.confidence),
        "iterations": int(res.iterations),
    })
    return np.asarray(res.transform, np.float64), stats


def main(argv=None) -> int:
    from mulls_tpu.io.dataset import read_point_cloud, write_point_cloud

    args, extra = build_parser().parse_known_args(argv)
    cfg = (load_flagfile(args.flagfile) if args.flagfile else MullsConfig())
    if extra:  # gflags parity: any --name=value accepted on the CLI
        from mulls_tpu.config import apply_flag_overrides
        cfg = apply_flag_overrides(cfg, extra)
    tgt = read_point_cloud(args.point_cloud_1_path)
    src = read_point_cloud(args.point_cloud_2_path)
    guess = None
    if args.appro_coordinate_file:
        guess = np.loadtxt(args.appro_coordinate_file).reshape(4, 4)

    # default coarse method follows the reference's switches: no coarse
    # step unless global registration is allowed; TEASER-style GNC vs
    # RANSAC via --teaser_on (`test/mulls_reg.cpp:169-178`)
    coarse = args.coarse_reg
    if coarse is None:
        if not args.is_global_reg:
            coarse = "none"
        elif cfg.submap.teaser_based_global_registration_on:
            coarse = "gnc"
        else:
            coarse = "ransac"

    T, stats = register_pair(cfg, tgt, src, coarse=coarse,
                             init_guess=guess)
    print("[mulls_tpu reg] T (source->target):")
    print(np.array_str(T, precision=6, suppress_small=True))
    print(f"[mulls_tpu reg] stats: {stats}")

    if args.output_point_cloud_path:
        moved = src["xyz"] @ T[:3, :3].T.astype(np.float32) + \
            T[:3, 3].astype(np.float32)
        # extension-dispatched like the reference (`mulls_reg.cpp:199-209`
        # -> `DataIo::write_cloud_file`): pcd/las/ply/txt/csv/bin
        write_point_cloud(args.output_point_cloud_path, moved,
                          src.get("intensity"))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"transform": T.tolist(), **stats}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
