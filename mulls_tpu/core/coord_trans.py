"""Coordinate-system adjustment between control-point lists — the
geo-referencing extras of the reference (`cregistration.hpp:2927-3384`):

* :func:`coord_tran_4dof` — 4-DoF similarity (x/y translation + yaw +
  scale) linear least squares (`coord_system_tran_4dof_lls`)
* :func:`coord_tran_6dof_svd` — rigid SE(3) via the Umeyama/SVD closed
  form (`coord_system_tran_6dof_svd`)
* :func:`coord_tran_7dof` — 7-DoF Helmert (3 translations, 3 small
  rotations, scale) linear least squares (`coord_system_tran_7dof`)

All run as plain jax on host-sized inputs (control-point lists are tiny).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def coord_tran_4dof(src: jnp.ndarray, dst: jnp.ndarray,
                    weights: jnp.ndarray = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plane similarity: dst_xy = s * R(yaw) @ src_xy + t, dst_z = src_z + tz.
    Returns ([4,4] transform embedding s*R, scale)."""
    n = src.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None else weights
    wsum = jnp.sum(w)
    # parameters p = (a, b, tx, ty) with a = s cos(yaw), b = s sin(yaw)
    # dst_x = a sx - b sy + tx ; dst_y = b sx + a sy + ty
    sx, sy = src[:, 0], src[:, 1]
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    A = jnp.concatenate([
        jnp.stack([sx, -sy, ones, zeros], -1),
        jnp.stack([sy, sx, zeros, ones], -1)], 0)
    b = jnp.concatenate([dst[:, 0], dst[:, 1]])
    ww = jnp.concatenate([w, w])
    ATA = jnp.einsum("n,ni,nj->ij", ww, A, A)
    ATb = jnp.einsum("n,ni,n->i", ww, A, b)
    p = jnp.linalg.solve(ATA + 1e-9 * jnp.eye(4), ATb)
    a, bb, tx, ty = p
    s = jnp.sqrt(a * a + bb * bb)
    tz = jnp.sum(w * (dst[:, 2] - src[:, 2])) / wsum
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[0, 0].set(a).at[0, 1].set(-bb)
    T = T.at[1, 0].set(bb).at[1, 1].set(a)
    T = T.at[0, 3].set(tx).at[1, 3].set(ty).at[2, 3].set(tz)
    return T, s


def coord_tran_6dof_svd(src: jnp.ndarray, dst: jnp.ndarray,
                        with_scale: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid (optionally similarity) alignment dst ~ s R src + t, Umeyama
    closed form.  Returns ([4,4], scale)."""
    mu_s = jnp.mean(src, 0)
    mu_d = jnp.mean(dst, 0)
    cs = src - mu_s
    cd = dst - mu_d
    H = cs.T @ cd / src.shape[0]
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    if with_scale:
        var_s = jnp.mean(jnp.sum(cs * cs, -1))
        s = jnp.sum(S * jnp.asarray([1.0, 1.0, d])) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.float32(1.0)
    t = mu_d - s * R @ mu_s
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(s * R).at[:3, 3].set(t)
    return T, s


def coord_tran_7dof(src: jnp.ndarray, dst: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Small-angle 7-parameter Helmert transform
    (dx, dy, dz, rx, ry, rz, mu) solved linearly:
    dst = (1+mu) (I + skew(r)) src + t."""
    n = src.shape[0]
    x, y, z = src[:, 0], src[:, 1], src[:, 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows = []
    rhs = []
    # eq x: dx + 0 + 0 + 0*rx + z*ry - y*rz + x*mu = dst_x - x
    rows.append(jnp.stack([ones, zeros, zeros, zeros, z, -y, x], -1))
    rhs.append(dst[:, 0] - x)
    rows.append(jnp.stack([zeros, ones, zeros, -z, zeros, x, y], -1))
    rhs.append(dst[:, 1] - y)
    rows.append(jnp.stack([zeros, zeros, ones, y, -x, zeros, z], -1))
    rhs.append(dst[:, 2] - z)
    A = jnp.concatenate(rows, 0)
    b = jnp.concatenate(rhs)
    p = jnp.linalg.solve(A.T @ A + 1e-9 * jnp.eye(7), A.T @ b)
    t = p[:3]
    r = p[3:6]
    mu = p[6]
    R = jnp.eye(3) + jnp.asarray([[0.0, -r[2], r[1]],
                                  [r[2], 0.0, -r[0]],
                                  [-r[1], r[0], 0.0]])
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set((1.0 + mu) * R).at[:3, 3].set(t)
    return T, 1.0 + mu
