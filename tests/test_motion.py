"""Motion compensation: azimuth timestamp model + slerp undistortion
(`cfilter.hpp:412-549` parity)."""

import numpy as np
import jax.numpy as jnp

from mulls_tpu.core import se3
from mulls_tpu.ops import motion


def test_azimuth_ratio_monotone_sweep():
    # points laid out clockwise starting at +x
    angles = -np.linspace(0, 1.9 * np.pi, 100)
    xyz = np.stack([np.cos(angles), np.sin(angles),
                    np.zeros_like(angles)], -1).astype(np.float32)
    mask = np.ones(100, bool)
    r = np.asarray(motion.timestamp_ratio_from_azimuth(
        jnp.asarray(xyz), jnp.asarray(mask)))
    assert r[0] == 0.0
    assert np.all(np.diff(r) > 0)
    assert r[-1] < 1.0


def test_undistort_identity_motion():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
    ts = rng.uniform(0, 1, 50).astype(np.float32)
    out = np.asarray(motion.undistort(jnp.asarray(xyz), jnp.asarray(ts),
                                      jnp.ones(50, bool),
                                      jnp.eye(4, dtype=jnp.float32)))
    np.testing.assert_allclose(out, xyz, atol=1e-5)


def test_undistort_endpoints_and_half():
    # T_rel: rotate 10 deg about z + translate [1, 0, 0]
    ang = np.radians(10.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                 [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    T[0, 3] = 1.0
    p = np.array([[5.0, 2.0, 1.0]], np.float32)

    # s=0 (start of frame): no correction
    out0 = np.asarray(motion.undistort(
        jnp.asarray(p), jnp.asarray([0.0], jnp.float32), jnp.ones(1, bool),
        jnp.asarray(T)))
    np.testing.assert_allclose(out0, p, atol=1e-5)

    # s=1 (end of frame): full T applied
    out1 = np.asarray(motion.undistort(
        jnp.asarray(p), jnp.asarray([1.0], jnp.float32), jnp.ones(1, bool),
        jnp.asarray(T)))
    expect = (T[:3, :3] @ p[0] + T[:3, 3])
    np.testing.assert_allclose(out1[0], expect, atol=1e-5)

    # s=0.5: half rotation + half translation
    outh = np.asarray(motion.undistort(
        jnp.asarray(p), jnp.asarray([0.5], jnp.float32), jnp.ones(1, bool),
        jnp.asarray(T)))
    half = np.radians(5.0)
    Rh = np.array([[np.cos(half), -np.sin(half), 0],
                   [np.sin(half), np.cos(half), 0], [0, 0, 1]])
    np.testing.assert_allclose(outh[0], Rh @ p[0] + [0.5, 0, 0], atol=1e-5)


def test_undistort_straightens_skewed_wall():
    """A straight wall scanned during pure forward motion appears skewed in
    the raw frame; undistortion with the true motion must straighten it."""
    n = 200
    ts = np.linspace(0, 1, n).astype(np.float32)
    wall_y = np.linspace(-5, 5, n).astype(np.float32)
    # true wall at x=10 in END-of-frame coords; scanner moves +x at 1 m/frame
    # point captured at time s sees the wall at x = 10 - (s-1)*v ... raw
    # coordinate = wall point in the frame at time s:
    v = 1.0
    raw_x = 10.0 - (ts - 1.0) * v  # at s=1: 10 (end frame), s=0: 11
    raw = np.stack([raw_x, wall_y, np.zeros(n, np.float32)], -1)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = v  # frame k pose in frame k-1: moved +x by v
    # remaining motion for point s is (1-s)*v applied... undistort into
    # end-of-frame coords: x should all become 10... our convention moves
    # points by T^(1-s); the raw x at time s is 10 + (1-s)v in the
    # *instantaneous* frame; undistorting into the START frame adds motion.
    out = np.asarray(motion.undistort(
        jnp.asarray(raw), jnp.asarray(ts), jnp.ones(n, bool), jnp.asarray(T)))
    # after compensation the wall must be flat (constant x)
    assert out[:, 0].std() < 0.02, out[:, 0].std()


def test_post_registration_undistort_frame_roundtrip():
    """timing="post" (`mulls_slam.cpp:704-715`): distorting a feature
    cloud by the per-point interpolated motion and undistorting with the
    measured T_rel must recover the original points."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from mulls_tpu.config import MullsConfig
    from mulls_tpu.core import se3
    from mulls_tpu.core.cloud import FeatureCloud, FeatureFrame, VertexDescriptors
    from mulls_tpu.ops.motion import undistort
    from mulls_tpu.pipeline.odometry import _undistort_frame

    rng = np.random.default_rng(0)
    n = 256
    xyz = jnp.asarray(rng.uniform(-20, 20, (n, 3)).astype(np.float32))
    ts = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=n) < 0.9)
    T_rel = np.asarray(se3.make_transform(
        jnp.asarray([0.8, 0.1, 0.0]), jnp.asarray([0.0, 0.0, 0.15])))
    # exact inverse of the undistortion map y = R^s x + s t:
    # x_dist = R^{-s} (y - s t), built per-point in numpy
    from scipy.spatial.transform import Rotation as _Rot
    rv = _Rot.from_matrix(np.asarray(T_rel[:3, :3])).as_rotvec()
    xd = np.empty((n, 3), np.float32)
    for i in range(n):
        s = float(ts[i])
        Rs = _Rot.from_rotvec(rv * s).as_matrix()
        xd[i] = Rs.T @ (np.asarray(xyz[i]) - s * np.asarray(T_rel[:3, 3]))
    x_dist = jnp.asarray(xd)

    def cloud(x):
        z = jnp.zeros((n,), jnp.float32)
        return FeatureCloud(xyz=x, normal=jnp.zeros((n, 3), jnp.float32),
                            intensity=z, strength=z, height=z,
                            ts_ratio=ts, mask=mask)

    frame = FeatureFrame(
        full={"ground": cloud(x_dist)}, down={"ground": cloud(x_dist)},
        descriptors=VertexDescriptors(vec=jnp.zeros((4, 11), jnp.float32),
                                      mask=jnp.zeros(4, bool)),
        bbx_min=jnp.zeros(3), bbx_max=jnp.zeros(3))
    cfg = MullsConfig()
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map, motion_compensation_method=1,
        motion_compensation_timing="post"))
    out = _undistort_frame(frame, jnp.asarray(T_rel, jnp.float32), cfg)
    got = np.asarray(out.down["ground"].xyz)
    m = np.asarray(mask)
    np.testing.assert_allclose(got[m], np.asarray(xyz)[m], atol=2e-3)
    # timing="pre" config leaves the frame untouched here
    cfg_pre = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map, motion_compensation_timing="pre"))
    out2 = _undistort_frame(frame, jnp.asarray(T_rel, jnp.float32), cfg_pre)
    np.testing.assert_allclose(np.asarray(out2.down["ground"].xyz),
                               np.asarray(x_dist))
