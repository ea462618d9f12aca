"""Per-frame feature extraction — the `extract_semantic_pts` equivalent
(reference `cfilter.hpp:2295-2413` orchestrating `fast_ground_filter`,
`get_pc_pca_feature`, `classify_nground_pts`, `encode_stable_points`,
`non_max_suppress`, fixed-num budgets).

Everything here is jit-compiled with static shapes; the output
:class:`FeatureFrame` holds fixed-capacity masked clouds:

  raw [N_raw] -> unground [20k] --PCA--> class masks -> full clouds
  (budgeted compaction) -> NMS + sector-balanced budgets -> down clouds

The PCA pass is the masked-matmul moment engine (ops.neighbors); the NCC
descriptor pass reuses the same engine with class one-hot features over a
budgeted vertex-candidate set.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from mulls_tpu.config import MullsConfig
from mulls_tpu.core.cloud import (FeatureCloud, FeatureFrame, RawCloud,
                                  VertexDescriptors, compact_topk_random,
                                  compact_topk_score, masked_max, masked_min)
from mulls_tpu.ops import ground as ground_ops
from mulls_tpu.ops import neighbors as nbr
from mulls_tpu.ops import nms as nms_ops
from mulls_tpu.ops import pca as pca_ops
from mulls_tpu.ops import voxel as voxel_ops


def _gather_cloud(xyz, normal, intensity, strength, height, ts, mask,
                  capacity, key, prefer=None) -> FeatureCloud:
    idx, valid = compact_topk_random(mask, capacity, key, prefer=prefer)
    return FeatureCloud(
        xyz=xyz[idx], normal=normal[idx], intensity=intensity[idx],
        strength=strength[idx], height=height[idx], ts_ratio=ts[idx],
        mask=valid)


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(raw: RawCloud, cfg: MullsConfig, key: jax.Array,
                     nonground_rate: jnp.ndarray = None) -> FeatureFrame:
    pre = cfg.preprocess
    gcfg = cfg.ground
    fcfg = cfg.feature
    shapes = cfg.shapes
    keys = jax.random.split(key, 16)

    # --- pre-filtering (`mulls_slam.cpp:404-407`, `cfilter.hpp:2331-2343`)
    mask = raw.mask
    if pre.vertical_ang_calib_on and pre.vertical_ang_correction_deg != 0.0:
        from mulls_tpu.ops.motion import vertical_intrinsic_calibration
        raw = raw.replace(xyz=vertical_intrinsic_calibration(
            raw.xyz, pre.vertical_ang_correction_deg))
    if pre.apply_dist_filter:
        mask = voxel_ops.dist_filter_mask(raw.xyz, mask, pre.min_dist_used,
                                          pre.max_dist_used)
    if pre.apply_scanner_filter:
        mask = voxel_ops.scanner_filter_mask(raw.xyz, mask,
                                             pre.scanner_self_radius,
                                             pre.underground_height_thre)
    if pre.cloud_down_res > 0:
        mask = mask & voxel_ops.voxel_downsample_mask(raw.xyz, mask,
                                                      pre.cloud_down_res)

    # --- Semantic-KITTI assistance: moving-object / outlier pre-filter
    # (`filter_with_dynamic_object_mask_pre`, `cfilter.hpp:2487-2504`:
    # labels >= 250 are moving classes, 1 is 'outlier')
    semantic = fcfg.semantic_assist_on and raw.label is not None
    if semantic:
        mask = mask & (raw.label < 250) & (raw.label != 1)

    # --- ground / unground split (`cfilter.hpp:1658-2036`)
    g = ground_ops.fast_ground_filter(
        raw.xyz, raw.intensity, mask, gcfg, shapes, keys[0],
        fixed_num_downsampling=fcfg.fixed_num_downsampling_on,
        nonground_rate=nonground_rate)

    # --- ROI filter: delete the y band (e.g. oncoming-traffic lane) from
    # the unground cloud (`cfilter.hpp:2367-2374`, bbx delete_box=true)
    is_unground = g.is_unground
    if pre.apply_roi_filter:
        in_band = ((raw.xyz[:, 1] > pre.roi_min_y)
                   & (raw.xyz[:, 1] < pre.roi_max_y))
        is_unground = is_unground & ~in_band

    # --- compact the unground set to the PCA budget
    ug_idx, ug_valid = compact_topk_random(is_unground,
                                           shapes.n_unground, keys[1])
    ug_xyz = raw.xyz[ug_idx]
    ug_int = raw.intensity[ug_idx]
    ug_ts = raw.ts_ratio[ug_idx]
    ug_h = g.height[ug_idx]

    # --- neighborhood PCA (`pca.hpp:294-354`).  The reference strides the
    # QUERIES by pca_down_rate (default 2, `mulls_slam.cpp:84`,
    # `pca.hpp:304`) while the kd-tree support stays the full cloud;
    # unqueried points keep pt_num=0 and are never classified
    # (`cfilter.hpp:2102`).  The compaction above is a uniform-random
    # permutation, so "the first n_q rows" IS a random 1/rate subset —
    # the TPU equivalent of the systematic stride.
    n_q = shapes.n_unground // max(fcfg.pca_down_rate, 1)
    # Morton-order the query subset: the PCA moments kernel centers each
    # query tile before its bf16 hi/lo split, so spatially-tight tiles keep
    # the quantization noise negligible.  (The subset stays the same random
    # 1/rate sample; only its row order changes.)
    qo = pca_ops.morton_order(ug_xyz[:n_q])
    q_xyz = ug_xyz[:n_q][qo]
    q_valid = ug_valid[:n_q][qo]
    q_int = ug_int[:n_q][qo]
    q_ts = ug_ts[:n_q][qo]
    q_h = ug_h[:n_q][qo]
    feats = pca_ops.pca_features(
        q_xyz, q_valid, ug_xyz, ug_valid,
        radius=fcfg.cloud_pca_neigh_r, min_k=fcfg.cloud_pca_neigh_k_min,
        distance_adaptive=fcfg.use_distance_adaptive_pca,
        unit_dist=fcfg.unit_dist, chunk=1024)

    # --- classification (`cfilter.hpp:2102-2168`)
    sin_pillar = math.sin(math.radians(fcfg.pillar_direction_ang))
    sin_beam = math.sin(math.radians(fcfg.beam_direction_ang))
    sin_facade = math.sin(math.radians(fcfg.facade_normal_ang))
    sin_roof = math.sin(math.radians(fcfg.roof_normal_ang))

    pz = jnp.abs(feats.principal[:, 2])
    nz = jnp.abs(feats.normal[:, 2])
    z = q_xyz[:, 2]
    linear = feats.valid & (feats.linearity > fcfg.linearity_thre)
    planar = feats.valid & ~linear & (feats.planarity > fcfg.planarity_thre)
    is_pillar = linear & (pz > sin_pillar)
    is_beam = linear & (pz < sin_beam) & (z < fcfg.beam_max_height)
    is_roof = planar & (nz > sin_roof) & (z > fcfg.roof_height_min)
    is_facade = planar & (nz < sin_facade)

    # --- semantic mask refinement (`filter_with_semantic_mask`,
    # `cfilter.hpp:2508-2608`): inside the labeled radius a feature point
    # must also carry a whitelisted class label; beyond it (Semantic-KITTI
    # stops labeling ~50 m out) geometry alone decides
    if semantic:
        ug_label = raw.label[ug_idx][:n_q][qo]
        beyond = (jnp.sum(q_xyz[:, :2] ** 2, -1)
                  > fcfg.semantic_labeled_radius ** 2)

        def lab_in(*ids):
            ok = jnp.zeros_like(beyond)
            for i in ids:
                ok = ok | (ug_label == i)
            return ok | beyond

        is_pillar = is_pillar & lab_in(71, 80, 81)
        is_facade = is_facade & lab_in(50, 13, 51, 10)
    class_id = (1 * is_pillar + 2 * is_beam + 3 * is_facade + 4 * is_roof
                ).astype(jnp.int32)

    # --- vertex candidates + NCC descriptor pass
    # (`cfilter.hpp:2176-2226`, `encode_stable_points` :1071-1181)
    # candidate queries for pass 2: all high-curvature points (stable-point
    # gate 0.3*thre is a superset of the vertex-method-2 gate)
    curv_gate = feats.valid & (feats.curvature > 0.3 * fcfg.curvature_thre)
    # the candidate pool has only n_q rows: a flag-settable
    # pca_down_rate >= 6 makes n_q < n_vertex_full and lax.top_k would
    # fail at trace time — clamp the request and pad back to the static
    # budget (padded rows carry valid=False and are inert downstream)
    kv = min(shapes.n_vertex_full, curv_gate.shape[0])
    cand_idx, cand_valid = compact_topk_score(curv_gate, feats.curvature, kv)
    if kv < shapes.n_vertex_full:
        pad = shapes.n_vertex_full - kv
        cand_idx = jnp.concatenate(
            [cand_idx, jnp.zeros((pad,), cand_idx.dtype)])
        cand_valid = jnp.concatenate(
            [cand_valid, jnp.zeros((pad,), cand_valid.dtype)])
    # support classes over the FULL unground cloud: unqueried rows keep
    # class 0 (one_hot(-1) = zero row), exactly the reference's
    # index_with_feature default for non-PCA'd points
    onehot = jax.nn.one_hot(class_id - 1, 4, dtype=jnp.float32)
    onehot = onehot * q_valid[:, None]
    onehot_full = jnp.zeros((shapes.n_unground, 4), jnp.float32
                            ).at[qo].set(onehot)
    # K-capped neighborhoods like the reference's radiusSearch(max_nn=K)
    # (`pca.hpp:326`): normalizing the category percentages by the full
    # in-radius count dilutes descriptors in dense areas until NCC
    # matching collapses (featureless keypoints all look alike)
    r_desc = jnp.full((shapes.n_vertex_full,), fcfg.cloud_pca_neigh_r,
                      jnp.float32)
    if fcfg.use_distance_adaptive_pca:
        dq = jnp.linalg.norm(q_xyz[cand_idx], axis=-1)
        r_desc = r_desc * jnp.sqrt(jnp.maximum(dq / fcfg.unit_dist, 1.0))
    m2 = nbr.knn_class_counts(
        q_xyz[cand_idx], cand_valid, ug_xyz, ug_valid, r_desc,
        k=fcfg.cloud_pca_neigh_k, class_onehot=onehot_full,
        p_intensity=ug_int,
        close_r2=0.64 * fcfg.cloud_pca_neigh_r ** 2, chunk=256)
    cand_count = jnp.maximum(m2["count"].astype(jnp.float32), 1.0)
    close_counts = m2["close_counts"]  # pillar/beam/facade/roof
    far_counts = m2["far_counts"]
    class_counts = close_counts + far_counts
    geo_count = jnp.sum(class_counts, axis=1)
    mean_int = m2["int_sum"] / cand_count

    # vertex-method-2: unclassified high-curvature points whose neighborhood
    # is rich in feature points get promoted to pillar/beam
    vertex_ratio_thre = fcfg.feature_pts_ratio_guess / fcfg.pca_down_rate
    cand_curv = feats.curvature[cand_idx]
    cand_class = class_id[cand_idx]
    cand_pz = jnp.abs(feats.principal[cand_idx, 2])
    cand_z = q_xyz[cand_idx, 2]
    promoted = (cand_valid & (cand_class == 0)
                & (cand_curv > fcfg.curvature_thre)
                & (geo_count / cand_count > vertex_ratio_thre))
    promote_pillar = promoted & (cand_pz > sin_pillar)
    promote_beam = promoted & (cand_pz < sin_beam) & (cand_z < fcfg.beam_max_height)
    if fcfg.extract_vertex_points_method == 2:
        is_pillar = is_pillar.at[cand_idx].set(
            is_pillar[cand_idx] | promote_pillar)
        is_beam = is_beam.at[cand_idx].set(is_beam[cand_idx] | promote_beam)

    # stable keypoints (the vertex cloud): enough featured neighbors
    min_neighbor_feature_pts = int(
        fcfg.feature_pts_ratio_guess / fcfg.pca_down_rate
        * fcfg.cloud_pca_neigh_k) - 1
    stable = (cand_valid
              & (m2["count"] > fcfg.cloud_pca_neigh_k_min)
              & (geo_count >= min_neighbor_feature_pts))

    # strengths (normal[3] parity): linearity for linear classes, planarity
    # for planar, 5*curvature for promoted vertices
    strength = jnp.where(is_pillar | is_beam, feats.linearity,
                         jnp.where(is_facade | is_roof, feats.planarity, 0.0))
    strength = strength.at[cand_idx].set(
        jnp.where(promoted, 5.0 * cand_curv, strength[cand_idx]))
    # direction vector: principal for linear, plane normal for planar
    direction = jnp.where((is_pillar | is_beam)[:, None], feats.principal,
                          feats.normal)

    # --- build the full per-class clouds (budgeted compaction) from the
    # PCA-queried subset (the only points that can carry a class)
    def unground_cloud(m, capacity, k):
        return _gather_cloud(q_xyz, direction, q_int, strength,
                             q_h, q_ts, m, capacity, k)

    full = {}
    full["pillar"] = unground_cloud(is_pillar, shapes.n_pillar_full, keys[2])
    full["beam"] = unground_cloud(is_beam, shapes.n_beam_full, keys[3])
    full["facade"] = unground_cloud(is_facade, shapes.n_facade_full, keys[4])
    full["roof"] = unground_cloud(is_roof, shapes.n_roof_full, keys[5])

    # ground full cloud (already rate-downsampled inside the filter when
    # fixed-num is off; here we carry the full band and budget-compact)
    is_ground = g.is_ground
    if semantic:
        gl = raw.label
        g_beyond = (jnp.sum(raw.xyz[:, :2] ** 2, -1)
                    > fcfg.semantic_labeled_radius ** 2)
        g_ok = g_beyond
        for i in (40, 44, 48, 49, 60, 72):
            g_ok = g_ok | (gl == i)
        is_ground = is_ground & g_ok
    gr_idx, gr_valid = compact_topk_random(is_ground, shapes.n_ground_full,
                                           keys[6])
    gr_xyz = raw.xyz[gr_idx]
    gr_normal = g.normal[gr_idx]
    # ground normal methods 1/2 (`cfilter.hpp:1860-1925`): radius- / kNN-
    # PCA on the compacted ground cloud (method 0 = (0,0,1), method 3 =
    # per-grid plane, both handled inside the ground filter)
    if cfg.ground.ground_normal_method in (1, 2):
        gfeats = pca_ops.pca_features(
            gr_xyz, gr_valid, gr_xyz, gr_valid,
            radius=cfg.ground.normal_estimation_radius,
            min_k=fcfg.cloud_pca_neigh_k_min,
            distance_adaptive=False, unit_dist=fcfg.unit_dist, chunk=1024)
        nrm = gfeats.normal * jnp.where(gfeats.normal[:, 2:3] < 0, -1.0, 1.0)
        gr_normal = jnp.where(gfeats.valid[:, None], nrm,
                              jnp.zeros_like(nrm).at[:, 2].set(1.0))
    full["ground"] = FeatureCloud(
        xyz=gr_xyz, normal=gr_normal,
        intensity=raw.intensity[gr_idx],
        strength=jnp.zeros_like(raw.intensity[gr_idx]),
        height=jnp.zeros_like(raw.intensity[gr_idx]),
        ts_ratio=raw.ts_ratio[gr_idx], mask=gr_valid)

    # vertex cloud: stable keypoints, curvature saliency.  A zero keep
    # budget disables the class like the other zero-budget cases: keep a
    # capacity-1 fully-masked cloud so the scan carry structure matches
    vx_idx, vx_valid = compact_topk_score(stable, cand_curv,
                                          max(fcfg.vertex_keep_num, 1))
    if fcfg.vertex_keep_num <= 0:
        vx_valid = jnp.zeros_like(vx_valid)
    gi = cand_idx[vx_idx]  # indices into the (morton-ordered) query subset
    full["vertex"] = FeatureCloud(
        xyz=q_xyz[gi], normal=feats.principal[gi],
        intensity=mean_int[vx_idx], strength=5.0 * feats.curvature[gi],
        height=q_h[gi], ts_ratio=q_ts[gi], mask=vx_valid)
    pct = lambda c: jnp.floor(100.0 * c / cand_count[:, None])
    desc_vec = jnp.concatenate([
        pct(close_counts)[vx_idx], pct(far_counts)[vx_idx],
        mean_int[vx_idx, None], (feats.curvature[gi] * 100.0)[:, None],
        (q_h[gi] * 30.0)[:, None]], axis=1)
    descriptors = VertexDescriptors(vec=desc_vec, mask=vx_valid)

    # --- NMS sharpening + fixed budgets -> down clouds
    # (`cfilter.hpp:2233-2270`)
    nms_radius = 0.25 * fcfg.cloud_pca_neigh_r
    down = {}

    def sharpened(cloud: FeatureCloud, budget: int, k, sector: bool
                  ) -> FeatureCloud:
        # a zero budget disables the class (e.g. `--beam_down_fixed_num=0`
        # in `lo_gflag_list_64.txt`): keep a capacity-1 fully-masked cloud
        # so every downstream gather stays well-formed
        if budget <= 0:
            idx, valid = compact_topk_random(cloud.mask, 1, k)
            return cloud.gather(idx, jnp.zeros_like(valid))
        keep = cloud.mask
        if fcfg.sharpen_with_nms_on:
            keep = nms_ops.non_max_suppress(cloud.xyz, cloud.strength,
                                            cloud.mask, nms_radius,
                                            iterations=fcfg.nms_iterations)
        if sector:
            keep = voxel_ops.xy_normal_balanced_mask(
                cloud.normal, keep, budget // fcfg.xy_balanced_sector_num,
                fcfg.xy_balanced_sector_num, k)
        idx, valid = compact_topk_random(keep, budget, k)
        return cloud.gather(idx, valid)

    down["pillar"] = sharpened(full["pillar"], fcfg.pillar_down_fixed_num,
                               keys[7], sector=False)
    down["facade"] = sharpened(full["facade"], fcfg.facade_down_fixed_num,
                               keys[8], sector=True)
    down["beam"] = sharpened(full["beam"], fcfg.beam_down_fixed_num,
                             keys[9], sector=True)
    down["roof"] = sharpened(full["roof"], fcfg.roof_down_fixed_num,
                             keys[10], sector=False)
    gd_idx, gd_valid = compact_topk_random(
        full["ground"].mask, max(fcfg.ground_down_fixed_num, 1), keys[11])
    if fcfg.ground_down_fixed_num <= 0:
        gd_valid = jnp.zeros_like(gd_valid)
    down["ground"] = full["ground"].gather(gd_idx, gd_valid)
    down["vertex"] = full["vertex"]

    bbx_min = masked_min(raw.xyz, mask[:, None], axis=0)
    bbx_max = masked_max(raw.xyz, mask[:, None], axis=0)
    return FeatureFrame(full=full, down=down, descriptors=descriptors,
                        bbx_min=bbx_min, bbx_max=bbx_max)
