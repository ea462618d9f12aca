"""Constraint-file I/O round trip + the small point filters and flag
wirings added for parity (`dataio.hpp:1247-1337`, `cfilter.hpp:755-805`,
`mulls_slam.cpp:143,181-182`)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from mulls_tpu.config import MullsConfig, apply_flag_overrides
from mulls_tpu.io.constraints import (read_constraint_file,
                                      write_constraint_file)
from mulls_tpu.ops import voxel as voxel_ops


class _Edge:
    def __init__(self, i, j, T, info, kind):
        self.i, self.j, self.T, self.info, self.kind = i, j, T, info, kind


def test_constraint_file_roundtrip(tmp_path, rng):
    path = str(tmp_path / "cons.txt")
    T1 = np.eye(4)
    T1[:3, 3] = [1.0, -2.0, 0.5]
    info = np.diag(rng.uniform(1, 10, 6))
    edges = [
        _Edge(0, 1, T1, info, kind=1),        # adjacent
        _Edge(0, 7, T1 @ T1, 2 * info, kind=2),  # registration (loop)
        _Edge(3, 9, np.eye(4), info, kind=-1),   # NONE: dropped on read
    ]
    n = write_constraint_file(path, edges, global_shift=(100.0, 200.0, 5.0))
    assert n == 3
    shift, cons = read_constraint_file(path)
    np.testing.assert_allclose(shift, [100.0, 200.0, 5.0])
    assert len(cons) == 2  # NONE record dropped (`dataio.hpp:1318-1319`)
    assert cons[0]["kind"] == 1 and cons[1]["kind"] == 2
    assert (cons[1]["block1"], cons[1]["block2"]) == (0, 7)
    np.testing.assert_allclose(cons[0]["T"], T1, atol=1e-6)
    np.testing.assert_allclose(cons[1]["info"], 2 * info, rtol=1e-6)


def test_intensity_filter_mask():
    inten = jnp.asarray([0.0, 10.0, 128.0, 250.0, 255.0])
    mask = jnp.ones(5, bool)
    keep = np.asarray(voxel_ops.intensity_filter_mask(
        inten, mask, min_i=0.05, max_i=0.9))
    # 0.05*255=12.75 < i < 0.9*255=229.5
    np.testing.assert_array_equal(keep, [False, False, True, False, False])


def test_incidence_angle_filter_mask():
    # point straight ahead on a wall facing the scanner: incidence 0;
    # grazing wall: incidence ~90 deg
    xyz = jnp.asarray([[10.0, 0, 0], [10.0, 0, 0]])
    normal = jnp.asarray([[1.0, 0, 0], [0.0, 1.0, 0]])
    mask = jnp.ones(2, bool)
    keep = np.asarray(voxel_ops.incidence_angle_filter_mask(
        xyz, normal, mask, min_rad=-1.0, max_rad=np.deg2rad(60.0)))
    np.testing.assert_array_equal(keep, [True, False])


def test_new_flag_mappings():
    cfg = apply_flag_overrides(MullsConfig(), [
        "--append_frame_radius=42.5",
        "--max_iter_inter_submap=77",
        "--max_iter_inner_submap=9",
        "--write_out_map_on=1",  # app-level flag: ignored by config tree
    ])
    assert cfg.map.append_frame_radius == 42.5
    assert cfg.submap.pgo_max_iter == 77
    assert cfg.submap.inner_refine_max_iter == 9


def test_append_frame_radius_crops_map_insert(rng):
    import jax
    from mulls_tpu.config import MapConfig, MapShapeConfig
    from mulls_tpu.core.cloud import FeatureCloud
    from mulls_tpu.frontend.features import FeatureFrame
    from mulls_tpu.mapping.local_map import init_local_map, update_local_map
    from mulls_tpu.core.cloud import FEATURE_NAMES, VertexDescriptors

    map_cfg = MapConfig(
        append_frame_radius=20.0, local_map_radius=80.0,
        map_based_dynamic_removal_on=False,
        shapes=MapShapeConfig(ground=128, pillar=64, beam=64, facade=128,
                              roof=32, vertex=32))
    lm = init_local_map(map_cfg)

    def mk(cap, n_near, n_far):
        c = FeatureCloud.empty(cap)
        xyz = np.zeros((cap, 3), np.float32)
        xyz[:n_near] = rng.uniform(-5, 5, (n_near, 3))
        xyz[n_near:n_near + n_far] = 50.0 + rng.uniform(0, 5, (n_far, 3))
        m = np.zeros(cap, bool)
        m[:n_near + n_far] = True
        return c.replace(xyz=jnp.asarray(xyz), mask=jnp.asarray(m))

    down = {n: mk(64, 10, 10) for n in FEATURE_NAMES}
    frame = FeatureFrame(full=down, down=down,
                         descriptors=VertexDescriptors.empty(64),
                         bbx_min=jnp.full(3, -60.0), bbx_max=jnp.full(3, 60.0))
    out = update_local_map(lm, frame, jnp.eye(4),
                           jnp.asarray(3.0), map_cfg, jax.random.key(0))
    # only the 10 near points per class survive the append crop
    for n in FEATURE_NAMES:
        cnt = int(np.asarray(out.clouds[n].mask).sum())
        assert cnt == 10, (n, cnt)
