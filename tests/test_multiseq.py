"""Multi-sequence data-parallel odometry over the virtual 8-device mesh."""

import numpy as np
import jax

import __graft_entry__ as ge
from mulls_tpu.parallel.mesh import make_mesh
from mulls_tpu.parallel.multiseq import MultiSeqPipeline
from tests.test_pipeline import _ListDataset, _loop_world, _simulate_scan


def test_multiseq_odometry_8seq(rng):
    cfg = ge._small_cfg()
    world = _loop_world(rng, n=60000, extent=40.0)
    mesh = make_mesh(8)

    datasets = []
    n_frames = 4
    gts = []
    for s in range(8):
        # each sequence drives a different heading
        ang = 2 * np.pi * s / 8
        d = np.array([np.cos(ang), np.sin(ang), 0.0])
        gt = []
        for k in range(n_frames):
            T = np.eye(4)
            T[:3, 3] = 0.5 * k * d
            gt.append(T)
        gts.append(gt)
        datasets.append(_ListDataset(
            _simulate_scan(world, g, cfg.shapes.n_raw, 30.0, rng)
            for g in gt))

    pipe = MultiSeqPipeline(cfg, mesh, segment=2)
    results = pipe.run(datasets)
    assert len(results) == 8
    for s, res in enumerate(results):
        assert all(c == 1 for c in res.codes), (s, res.codes)
        end = res.poses[-1, :3, 3]
        expect = gts[s][-1][:3, 3]
        assert np.linalg.norm(end - expect) < 0.15, (s, end, expect)
