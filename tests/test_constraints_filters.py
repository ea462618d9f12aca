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


def test_refresh_linear_map_vectors_recompute_and_cull():
    """`MapManager::update_cloud_vectors` parity (`map_manager.cpp:95-292`):
    re-PCA over the merged map replaces per-scan direction estimates and
    culls points whose neighborhood is no longer linear / well oriented."""
    import jax.numpy as jnp
    from mulls_tpu.config import MapConfig, MapShapeConfig
    from mulls_tpu.mapping.local_map import (init_local_map,
                                             refresh_linear_map_vectors)

    map_cfg = MapConfig(shapes=MapShapeConfig(
        ground=16, pillar=128, beam=128, facade=16, roof=16, vertex=16))
    lm = init_local_map(map_cfg)

    def line(n, axis, origin, spacing=0.12):
        pts = np.tile(np.asarray(origin, np.float32), (n, 1))
        pts[:, axis] += spacing * np.arange(n, dtype=np.float32)
        return pts

    # pillar cloud: [0:40] vertical line (kept, direction re-estimated to
    # +-z), [40:80] horizontal line (culled: |dir_z| < 0.80), [80:83]
    # isolated points (culled: < 6 neighbors within 1.8 m)
    pil = np.zeros((128, 3), np.float32)
    pil[:40] = line(40, 2, (0.0, 0.0, 0.0))
    pil[40:80] = line(40, 0, (10.0, 0.0, 0.0))
    pil[80:83] = [(30, 0, 0), (40, 0, 0), (50, 0, 0)]
    pmask = np.zeros(128, bool)
    pmask[:83] = True
    # seed every stored direction with garbage — refresh must overwrite it
    pnrm = np.tile(np.asarray([1.0, 0.0, 0.0], np.float32), (128, 1))

    # beam cloud: horizontal line kept, vertical line culled
    beam = np.zeros((128, 3), np.float32)
    beam[:40] = line(40, 1, (0.0, 20.0, 0.0))
    beam[40:80] = line(40, 2, (20.0, 20.0, 0.0))
    bmask = np.zeros(128, bool)
    bmask[:80] = True
    bnrm = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (128, 1))

    lm = lm.replace(clouds={
        **lm.clouds,
        "pillar": lm.clouds["pillar"].replace(
            xyz=jnp.asarray(pil), normal=jnp.asarray(pnrm),
            mask=jnp.asarray(pmask)),
        "beam": lm.clouds["beam"].replace(
            xyz=jnp.asarray(beam), normal=jnp.asarray(bnrm),
            mask=jnp.asarray(bmask)),
    })
    import jax
    out = jax.jit(refresh_linear_map_vectors)(lm)

    pm = np.asarray(out.clouds["pillar"].mask)
    assert pm[:40].all(), "vertical pillar line must survive"
    assert not pm[40:].any(), "horizontal + isolated pillar points culled"
    dirs = np.asarray(out.clouds["pillar"].normal[:40])
    assert np.all(np.abs(dirs[:, 2]) > 0.95), "direction re-estimated to z"

    bm = np.asarray(out.clouds["beam"].mask)
    assert bm[:40].all(), "horizontal beam line must survive"
    assert not bm[40:].any(), "vertical beam line culled"
    bdirs = np.asarray(out.clouds["beam"].normal[:40])
    assert np.all(np.abs(bdirs[:, 1]) > 0.95)
    # untouched classes keep their (empty) state
    assert int(np.asarray(out.clouds["ground"].mask).sum()) == 0


def test_all_reference_flagfiles_parse():
    """Every shipped sensor/dataset config must load into the typed tree
    (`script/config/lo_gflag_list_*.txt`, SURVEY.md §5.6)."""
    import glob
    from mulls_tpu.config import load_flagfile
    files = sorted(glob.glob(
        "/root/reference/script/config/lo_gflag_list_*.txt"))
    if not files:
        import pytest
        pytest.skip("reference configs not mounted")
    assert len(files) >= 10
    for f in files:
        cfg = load_flagfile(f)
        # sanity: the values actually land (every file sets these)
        assert cfg.reg.reg_max_iter_num_s2m > 0
        assert cfg.map.local_map_radius > 0
        assert 0 < cfg.map.local_map_recalculation_frequency
