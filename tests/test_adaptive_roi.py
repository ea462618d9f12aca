"""ROI filter (`cfilter.hpp:2367-2374`), self-adaptive non-ground rate
(`cfilter.hpp:2416-2444`), and s2m cadence config parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge

from mulls_tpu.config import MullsConfig, apply_flag_overrides

small_cfg = ge._small_cfg


def _scene(n=8192, seed=0):
    rng = np.random.default_rng(seed)
    n_g = n // 2
    g = np.stack([rng.uniform(-30, 30, n_g), rng.uniform(-30, 30, n_g),
                  0.03 * rng.normal(size=n_g) - 1.7], -1)
    n_w = n - n_g
    w = np.stack([np.where(rng.uniform(size=n_w) < 0.5, 12.0, -15.0)
                  + 0.04 * rng.normal(size=n_w),
                  rng.uniform(-25, 25, n_w), rng.uniform(-1.5, 2.5, n_w)],
                 -1)
    xyz = np.concatenate([g, w]).astype(np.float32)
    return {"xyz": xyz,
            "intensity": rng.uniform(0, 0.5, n).astype(np.float32),
            "ts_ratio": np.zeros(n, np.float32),
            "mask": np.ones(n, bool)}


def _to_raw(d):
    from mulls_tpu.core.cloud import RawCloud
    return RawCloud(xyz=jnp.asarray(d["xyz"]),
                    intensity=jnp.asarray(d["intensity"]),
                    ts_ratio=jnp.asarray(d["ts_ratio"]),
                    mask=jnp.asarray(d["mask"]))


def test_roi_filter_removes_band():
    from mulls_tpu.frontend.features import extract_features
    cfg = small_cfg()
    cfg_roi = dataclasses.replace(cfg, preprocess=dataclasses.replace(
        cfg.preprocess, apply_roi_filter=True,
        roi_min_y=-25.0, roi_max_y=25.0))
    raw = _to_raw(_scene())
    f0 = extract_features(raw, cfg, jax.random.key(0))
    f1 = extract_features(raw, cfg_roi, jax.random.key(0))
    # the ROI band covers every wall point -> no facade features survive
    assert int(f1.full["facade"].mask.sum()) == 0
    assert int(f0.full["facade"].mask.sum()) > 0
    # ground is untouched by the ROI filter (it acts on unground only)
    assert int(f1.full["ground"].mask.sum()) > 0


def test_adaptive_nonground_rate_keeps_more():
    from mulls_tpu.frontend.features import extract_features
    cfg = small_cfg()
    cfg = dataclasses.replace(cfg, ground=dataclasses.replace(
        cfg.ground, gf_nonground_down_rate=6, dist_inverse_sampling_method=0))
    raw = _to_raw(_scene())
    f_hi = extract_features(raw, cfg, jax.random.key(0),
                            nonground_rate=jnp.float32(6.0))
    f_lo = extract_features(raw, cfg, jax.random.key(0),
                            nonground_rate=jnp.float32(1.0))
    n_hi = int(f_hi.full["facade"].mask.sum())
    n_lo = int(f_lo.full["facade"].mask.sum())
    assert n_lo > n_hi  # rate 1 keeps ~6x the unground points


def test_adaptive_flag_and_cadence_flags():
    cfg = apply_flag_overrides(MullsConfig(), [
        "--adaptive_parameters_on=true",
        "--initial_scan2scan_frame_num=3",
        "--map_to_map_min_cor_ratio=0.25",
        "--num_frame_thre_large_drift=500",
        "--ndt_searching_method=1",
        "--post_sigma_thre=0.5",
        "--global_reg_min_inlier_count=12",
    ])
    assert cfg.feature.adaptive_parameters_on
    assert cfg.map.initial_scan2scan_frame_num == 3
    assert cfg.submap.map_to_map_min_cor_ratio == 0.25
    assert cfg.submap.num_frame_thre_large_drift == 500
    assert cfg.baseline.direct7 is False
    assert cfg.reg.sigma_thre == 0.5
    assert cfg.submap.teaser_min_inlier_count == 12


def test_adaptive_rate_updates_in_pipeline():
    """The fused step lowers the non-ground rate when features run dry."""
    from mulls_tpu.pipeline.odometry import init_state, slam_step
    from mulls_tpu.core.cloud import pack_raw_host
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        feature=dataclasses.replace(cfg.feature, adaptive_parameters_on=True,
                                    adaptive_nonground_min_expected=10000),
        ground=dataclasses.replace(cfg.ground, gf_nonground_down_rate=4,
                                   dist_inverse_sampling_method=0))
    state = init_state(cfg)
    assert float(state.nonground_rate) == 4.0
    state, _ = slam_step(state, jax.device_put(pack_raw_host(_scene())), cfg)
    # min_expected is set absurdly high, so the rate must drop
    assert float(state.nonground_rate) < 4.0
    assert float(state.nonground_rate) >= 1.0
