"""Motion compensation (scan undistortion) — reference parity
`cfilter.hpp:412-549`, applied in the main loop after registration
(`mulls_slam.cpp:704-715`).

Per-point in-frame timestamp ratios come either from sensor timestamps
(shipped in ``RawCloud.ts_ratio``) or from the azimuth fallback
(`cfilter.hpp:429-467`): the scanner sweeps azimuth once per revolution,
so the unwrapped bearing angle relative to the first return is a proxy for
time.  Undistortion interpolates each point's pose between the frame-start
and frame-end poses: quaternion slerp for rotation + linear interpolation
for translation (`cfilter.hpp:470-516`), vectorized over the cloud.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mulls_tpu.core import se3


def timestamp_ratio_from_azimuth(xyz: jnp.ndarray,
                                 mask: jnp.ndarray) -> jnp.ndarray:
    """[N,3] -> [N] ratio in [0,1]: unwrapped clockwise azimuth swept since
    the first valid return (`cfilter.hpp:429-467` rotating-scanner model)."""
    az = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # (-pi, pi]
    first = jnp.argmax(mask)  # first valid index
    az0 = az[first]
    # most spinning LiDARs sweep clockwise (decreasing azimuth)
    swept = jnp.mod(az0 - az, 2.0 * jnp.pi)
    ratio = swept / (2.0 * jnp.pi)
    return jnp.where(mask, ratio, 0.0)


def _quat_pow(q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Quaternion power q^w for unit q=[w,x,y,z], w in [0,1] — the slerp
    between identity and q."""
    qw = jnp.clip(q[0], -1.0, 1.0)
    angle = jnp.arccos(jnp.abs(qw))
    sign = jnp.where(qw < 0, -1.0, 1.0)  # shortest arc
    axis_norm = jnp.linalg.norm(q[1:])
    axis = q[1:] / jnp.maximum(axis_norm, 1e-12)
    new_angle = angle * w
    out = jnp.concatenate([jnp.cos(new_angle)[None],
                           jnp.sin(new_angle) * axis * sign])
    # q ~ identity: fall back to lerp-normalize (numerically stable)
    near_id = axis_norm < 1e-6
    lerp = jnp.concatenate([(1.0 - w + w * qw * sign)[None],
                            w[..., None] * q[1:] * sign])
    lerp = lerp / jnp.maximum(jnp.linalg.norm(lerp), 1e-12)
    return jnp.where(near_id, lerp, out)


def undistort(xyz: jnp.ndarray, ts_ratio: jnp.ndarray, mask: jnp.ndarray,
              T_rel: jnp.ndarray, min_range: float = 0.0) -> jnp.ndarray:
    """Undistort a scan given the in-frame motion ``T_rel`` (sensor pose at
    sweep end expressed in the sweep-start frame; for uniform motion this
    is the frame-to-frame registration result).

    A point captured at ratio ``s`` sits in the sensor frame of time
    ``s``, whose pose in the sweep-start frame is ``T_rel^s`` (uniform
    motion), so applying ``T_rel^s`` maps every return into one common
    (sweep-start) frame — the reference's per-point slerp + linear
    translation interpolation (`cfilter.hpp:470-516`).
    """
    q = se3.quat_from_rotation(T_rel[:3, :3])
    t = T_rel[:3, 3]
    w = jnp.clip(ts_ratio, 0.0, 1.0)

    qs = jax.vmap(lambda wi: _quat_pow(q, wi))(w)  # [N,4]
    Rs = se3.rotation_from_quat(qs)  # [N,3,3]
    ts = w[:, None] * t[None, :]
    out = jnp.einsum("nij,nj->ni", Rs, xyz) + ts
    keep = mask & (jnp.linalg.norm(xyz, axis=-1) > min_range)
    return jnp.where(keep[:, None], out, xyz)


def vertical_intrinsic_calibration(xyz: jnp.ndarray,
                                   var_vertical_ang_deg: float
                                   ) -> jnp.ndarray:
    """Regenerate a cloud whose scanner vertical angles are biased by a
    constant intrinsic error (`cfilter.hpp:250-292`
    ``vertical_intrinsic_calibration``): each return keeps its range and
    azimuth but its elevation is shifted by ``var_vertical_ang_deg``.
    A value >= 180 is the reference's sentinel for z-inversion (PANDAR XT).
    Static no-op when the correction is 0 so jitted callers pay nothing.
    """
    if var_vertical_ang_deg == 0.0:
        return xyz
    if var_vertical_ang_deg >= 180.0:
        return xyz * jnp.asarray([1.0, 1.0, -1.0], xyz.dtype)
    dang = jnp.float32(var_vertical_ang_deg * jnp.pi / 180.0)
    dist = jnp.linalg.norm(xyz, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    v_ang = jnp.arcsin(jnp.clip(xyz[:, 2] / safe, -1.0, 1.0))
    v_ang_c = v_ang + dang
    hor_scale = jnp.cos(v_ang_c) / jnp.maximum(jnp.cos(v_ang), 1e-12)
    out = jnp.stack([xyz[:, 0] * hor_scale, xyz[:, 1] * hor_scale,
                     dist * jnp.sin(v_ang_c)], -1)
    return jnp.where(dist[:, None] > 0, out, xyz)
