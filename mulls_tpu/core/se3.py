"""SE(3) / SO(3) utilities (device-side, f32, fully batched).

Euler conventions follow the reference: roll-pitch-yaw about x, y', z''
(``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``), matching the reference's
``construct_trans_a`` (`cregistration.hpp:2740-2764`) and the quaternion
variance-propagation Jacobian ``get_quat_euler_jacobi``
(`cregistration.hpp:2795-2836`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euler_to_rotation(euler: jnp.ndarray) -> jnp.ndarray:
    """roll-pitch-yaw (x, y', z'') -> 3x3 rotation. euler: [..., 3]."""
    a, b, g = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cg, sg = jnp.cos(g), jnp.sin(g)
    row0 = jnp.stack([cg * cb, -sg * ca + cg * sb * sa, sg * sa + cg * sb * ca], -1)
    row1 = jnp.stack([sg * cb, cg * ca + sg * sb * sa, -cg * sa + sg * sb * ca], -1)
    row2 = jnp.stack([-sb, cb * sa, cb * ca], -1)
    return jnp.stack([row0, row1, row2], -2)


def make_transform(tran: jnp.ndarray, euler: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] translation + [..., 3] euler -> [..., 4, 4] SE(3)."""
    rot = euler_to_rotation(euler)
    top = jnp.concatenate([rot, tran[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_x(x: jnp.ndarray) -> jnp.ndarray:
    """LLS solution vector [tx ty tz roll pitch yaw] -> exact SE(3) (parity
    with the reference's post-solve exact rebuild `cregistration.hpp:1333`)."""
    return make_transform(x[..., :3], x[..., 3:6])


def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Apply [4,4] (or batched) SE(3) to [..., N, 3] points."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], xyz) + T[..., None, :3, 3]


def rotate_vectors(T: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], vec)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """|angle| of the rotation, radians."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)


def translation_norm(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(T[..., :3, 3], axis=-1)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) (SVD), keeping det=+1."""
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.linalg.det(u @ vt)
    s = jnp.ones(R.shape[:-2] + (3,), R.dtype).at[..., 2].set(d)
    return (u * s[..., None, :]) @ vt


def quat_euler_jacobi(euler: jnp.ndarray) -> jnp.ndarray:
    """d(imaginary quaternion)/d(euler rpy) — parity with the reference
    `get_quat_euler_jacobi` (`cregistration.hpp:2795-2820`, xyz sequence).
    euler: [..., 3] -> [..., 3, 3]."""
    sr, sp, sy = (jnp.sin(0.5 * euler[..., i]) for i in range(3))
    cr, cp, cy = (jnp.cos(0.5 * euler[..., i]) for i in range(3))
    j00 = cr * cp * cy + sr * sp * sy
    j01 = -sr * sp * cy - cr * cp * sy
    j02 = -sr * cp * sy - cr * sp * cy
    j10 = -sr * sp * cy + cr * cp * sy
    j11 = cr * cp * cy - sr * sp * sy
    j12 = -cr * sp * sy + sr * cp * cy
    j20 = -sr * cp * sy - cr * sp * cy
    j21 = -cr * sp * sy - sr * cp * cy
    j22 = cr * cp * cy + sr * sp * sy
    J = jnp.stack(
        [jnp.stack([j00, j01, j02], -1),
         jnp.stack([j10, j11, j12], -1),
         jnp.stack([j20, j21, j22], -1)], -2)
    return 0.5 * J


# --- quaternions (w, x, y, z) for the pose graph --------------------------


def quat_from_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w, x, y, z] (Shepperd's method,
    branchless: compute all four candidates, pick the best-conditioned)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], -2)  # [..., 4, 4]
    scores = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], -1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def rotation_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = (q[..., i] for i in range(4))
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], -2)


# --- so(3)/se(3) exponential map (for PGO updates) -------------------------


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues. w: [..., 3] -> [..., 3, 3], numerically safe near 0."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    k = w / theta
    K = skew(k)
    th = theta[..., None]
    s, c = jnp.sin(th), jnp.cos(th)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R = eye + s * K + (1.0 - c) * (K @ K)
    small = (theta[..., None] < 1e-7)
    return jnp.where(small, eye + skew(w), R)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def se3_boxplus(T: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative update: T' = Exp([dt, dw]) * T.  delta: [..., 6]."""
    R = so3_exp(delta[..., 3:6])
    top = jnp.concatenate([R, delta[..., :3, None]], -1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    dT = jnp.concatenate([top, bottom], -2)
    return dT @ T
