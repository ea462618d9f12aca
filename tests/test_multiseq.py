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


def test_sharded_pgo_matches_single_device(rng):
    """Edge-sharded PGO over the 8-device mesh converges to the same
    solution as the single-device solver."""
    import jax.numpy as jnp
    from mulls_tpu.backend.pgo import (PoseGraph, optimize_pose_graph,
                                       optimize_pose_graph_sharded)
    from mulls_tpu.core import se3

    m = 9
    # ring of nodes with noisy odometry + one loop edge, padded to 16 edges
    t_true = np.stack([np.arange(m, dtype=np.float32),
                       np.zeros(m, np.float32),
                       np.zeros(m, np.float32)], -1)
    q_id = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (m, 1))
    e_i = np.arange(m - 1)
    e_j = np.arange(1, m)
    e_t = np.tile(np.asarray([1.0, 0, 0], np.float32), (m - 1, 1))
    # loop edge 0 -> 8 with exact measurement
    e_i = np.concatenate([e_i, [0]])
    e_j = np.concatenate([e_j, [m - 1]])
    e_t = np.concatenate([e_t, [[8.0, 0, 0]]])
    e = len(e_i)
    pad = 16 - e
    node_t0 = t_true + 0.1 * rng.normal(size=t_true.shape).astype(np.float32)
    node_t0[0] = 0.0
    graph = PoseGraph(
        node_t=jnp.asarray(node_t0), node_q=jnp.asarray(q_id),
        edge_i=jnp.asarray(np.concatenate([e_i, np.zeros(pad)]), jnp.int32),
        edge_j=jnp.asarray(np.concatenate([e_j, np.zeros(pad)]), jnp.int32),
        edge_t=jnp.asarray(np.concatenate([e_t, np.zeros((pad, 3))])
                           .astype(np.float32)),
        edge_q=jnp.asarray(np.tile(q_id[0], (16, 1))),
        edge_info=jnp.broadcast_to(jnp.eye(6), (16, 6, 6)),
        edge_mask=jnp.asarray(np.arange(16) < e),
        fixed=jnp.asarray(np.arange(m) == 0))

    t1, q1, _ = optimize_pose_graph(graph, iterations=15)
    from mulls_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    t2, q2, _ = optimize_pose_graph_sharded(graph, mesh, iterations=15)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t2)[:, 0],
                               t_true[:, 0], atol=0.05)


def test_distributed_helpers():
    """`parallel/distributed.py`: process slicing + sequence padding."""
    from mulls_tpu.parallel import distributed as dist
    from mulls_tpu.parallel.mesh import make_mesh
    assert dist.initialize_from_env() is False  # single host: no-op
    b, e = dist.process_slice(10)
    assert (b, e) == (0, 10)  # one process owns everything
    mesh = dist.global_mesh()
    assert mesh.devices.size == 8
    padded = dist.shard_sequences([1, 2, 3], make_mesh(8))
    assert len(padded) == 8 and padded[:3] == [1, 2, 3]
    assert all(x == 3 for x in padded[3:])
