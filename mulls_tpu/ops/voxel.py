"""Downsampling kernels (device side, fixed shapes, masked).

TPU-native replacements for the reference CFilter downsamplers:

* :func:`voxel_downsample_mask` — hash-grid voxel downsample, parity with
  `cfilter.hpp:83-165` (64-bit voxel key, keep one point per voxel) but
  sort-free: implemented as a scatter-argmin race on a dense-but-bounded
  voxel table, which XLA lowers to a single scatter.
* :func:`random_downsample` — fixed-count random subset
  (`cfilter.hpp:606-754`).
* :func:`dist_filter_mask` — ring distance filter (`cfilter.hpp:755-930`).
* :func:`xy_normal_balanced_mask` — azimuth-sector-balanced budget used for
  facade/beam (`cfilter.hpp:551-605`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hash_ijk(ijk: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """3D integer-cell hash (Teschner et al. primes), masked to a
    power-of-two table.  Shared by the voxel downsampler here and the
    NDT/VGICP voxel tables (`ops/baseline_reg.py`)."""
    h = (ijk[..., 0] * 73856093) ^ (ijk[..., 1] * 19349663) \
        ^ (ijk[..., 2] * 83492791)
    return (h & (table_size - 1)).astype(jnp.int32)


def dist_filter_mask(xyz: jnp.ndarray, mask: jnp.ndarray,
                     min_dist: float, max_dist: float,
                     use_z: bool = True) -> jnp.ndarray:
    """Keep points with min_dist <= range <= max_dist (xy-plane range when
    ``use_z`` is False). Parity: `cfilter.hpp:755-800`."""
    sq = jnp.sum(xyz ** 2, axis=-1) if use_z else jnp.sum(xyz[..., :2] ** 2, -1)
    return mask & (sq >= min_dist ** 2) & (sq <= max_dist ** 2)


def scanner_filter_mask(xyz: jnp.ndarray, mask: jnp.ndarray,
                        self_radius: float, underground_z: float) -> jnp.ndarray:
    """Drop scanner self-returns and underground ghosts
    (parity: `cfilter.hpp:914-930`)."""
    sq = jnp.sum(xyz ** 2, axis=-1)
    return mask & (sq > self_radius ** 2) & (xyz[..., 2] > underground_z)


def intensity_filter_mask(intensity: jnp.ndarray, mask: jnp.ndarray,
                          min_i: float = 0.0, max_i: float = 1.0,
                          intensity_scale: float = 255.0) -> jnp.ndarray:
    """Keep points with intensity inside (min_i, max_i) x scale.

    Parity: `cfilter.hpp:755-775` (``intensity_filter``; the reference's
    body compares against ``min_i_thre`` twice — an obvious typo — the
    documented intent, thresholds in [0,1] against a scaled max, is what
    is implemented here)."""
    return (mask & (intensity > min_i * intensity_scale)
            & (intensity < max_i * intensity_scale))


def incidence_angle_filter_mask(xyz: jnp.ndarray, normal: jnp.ndarray,
                                mask: jnp.ndarray,
                                min_rad: float = 0.0,
                                max_rad: float = 1.5707963) -> jnp.ndarray:
    """Keep points whose beam-to-surface incidence angle (between the
    viewing ray and the point normal) lies in (min_rad, max_rad).
    Parity: `cfilter.hpp:778-805` (``incidence_angle_filter``)."""
    rng = jnp.linalg.norm(xyz, axis=-1)
    dot = jnp.abs(jnp.sum(xyz * normal, axis=-1))
    ang = jnp.arccos(jnp.clip(dot / jnp.maximum(rng, 1e-9), -1.0, 1.0))
    return mask & (ang > min_rad) & (ang < max_rad)


def voxel_ids(xyz: jnp.ndarray, resolution: float,
              bbx_min: jnp.ndarray, dims: jnp.ndarray) -> jnp.ndarray:
    """Linear voxel id per point given grid dims [3] (int32)."""
    ijk = jnp.floor((xyz - bbx_min) / resolution).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, dims - 1)
    return (ijk[..., 0] * dims[1] + ijk[..., 1]) * dims[2] + ijk[..., 2]


def voxel_downsample_mask(xyz: jnp.ndarray, mask: jnp.ndarray,
                          resolution: float, table_size: int = 1 << 20,
                          ) -> jnp.ndarray:
    """Keep (at most) one valid point per voxel.

    Voxel keys are hashed into a power-of-two table; each point scatters its
    own index with `min` reduction, then a point survives if it won its
    slot.  Hash collisions merge distinct voxels (slightly over-aggressive
    downsampling) — with a 1M-slot table and <=131k points the collision
    rate is <7%, comparable to the reference's behavior at its default
    multiplier bounds (`cfilter.hpp:99-153`).
    """
    n = xyz.shape[0]
    ijk = jnp.floor(xyz / resolution).astype(jnp.int32)
    h = hash_ijk(ijk, table_size)
    idx = jnp.arange(n, dtype=jnp.int32)
    slot_val = jnp.where(mask, idx, n)
    table = jnp.full((table_size,), n, jnp.int32)
    table = table.at[h].min(slot_val)
    return mask & (table[h] == idx)


def random_downsample(mask: jnp.ndarray, keep_num: int, key: jax.Array
                      ) -> jnp.ndarray:
    """Random mask with at most ``keep_num`` surviving valid points
    (parity: `random_downsample_pcl`).  Returns a boolean mask, same shape."""
    n = mask.shape[0]
    score = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
    kth = jax.lax.top_k(score, min(keep_num, n))[0][-1]
    keep = score >= jnp.maximum(kth, 0.0)
    return mask & keep


def keep_rate_mask(mask: jnp.ndarray, rate: jnp.ndarray, key: jax.Array
                   ) -> jnp.ndarray:
    """Stochastic equivalent of the reference's ``j % rate == 0`` systematic
    sampling: keep each valid point with probability 1/rate.  ``rate`` may be
    per-point (distance-adaptive downsampling, `cfilter.hpp:1735-1753`)."""
    u = jax.random.uniform(key, mask.shape)
    return mask & (u * jnp.maximum(rate, 1.0) < 1.0)


def xy_normal_balanced_mask(normal: jnp.ndarray, mask: jnp.ndarray,
                            keep_per_sector: int, sector_num: int,
                            key: jax.Array) -> jnp.ndarray:
    """Keep ~keep_per_sector random points per azimuth sector of the
    direction vector (parity: `xy_normal_balanced_downsample`,
    `cfilter.hpp:551-605`).  Directions are sign-canonicalized so v and -v
    share a sector."""
    v = jnp.where(normal[..., 1:2] < 0, -normal, normal)  # canonical: ny >= 0
    az = jnp.arctan2(v[..., 1], v[..., 0])  # [0, pi)
    sector = jnp.clip((az / (jnp.pi / sector_num)).astype(jnp.int32),
                      0, sector_num - 1)
    u = jax.random.uniform(key, mask.shape)
    keep = jnp.zeros_like(mask)
    for s in range(sector_num):
        m_s = mask & (sector == s)
        score = jnp.where(m_s, u, -1.0)
        kth = jax.lax.top_k(score, min(keep_per_sector, mask.shape[0]))[0][-1]
        keep = keep | (m_s & (score >= jnp.maximum(kth, 0.0)))
    return keep
