"""Parity tests for the Pallas TPU kernels against the plain-XLA
reference implementations in mulls_tpu.ops.neighbors (interpret mode on
the CPU backend)."""

import numpy as np
import jax.numpy as jnp

from mulls_tpu.ops import neighbors
from mulls_tpu.ops.kernels import moments_pallas, nn_pallas


def _clouds(rng, qn=300, pn=2500):
    q = rng.uniform(-40, 40, (qn, 3)).astype(np.float32)
    p = rng.uniform(-40, 40, (pn, 3)).astype(np.float32)
    qm = rng.uniform(size=qn) < 0.9
    pm = rng.uniform(size=pn) < 0.9
    return jnp.asarray(q), jnp.asarray(qm), jnp.asarray(p), jnp.asarray(pm)


def test_nn_parity(rng):
    q, qm, p, pm = _clouds(rng)
    idx_ref, d2_ref = neighbors.nearest_neighbor(q, qm, p, pm)
    idx_k, d2_k = nn_pallas(q, qm, p, pm, interpret=True)
    np.testing.assert_allclose(np.asarray(d2_k)[np.asarray(qm)],
                               np.asarray(d2_ref)[np.asarray(qm)],
                               rtol=1e-4, atol=1e-3)
    # indices must point at (near-)equidistant support points
    qn = np.asarray(q)
    d_via_k = np.sum((qn - np.asarray(p)[np.asarray(idx_k)]) ** 2, -1)
    d_via_ref = np.sum((qn - np.asarray(p)[np.asarray(idx_ref)]) ** 2, -1)
    m = np.asarray(qm)
    np.testing.assert_allclose(d_via_k[m], d_via_ref[m], rtol=1e-4, atol=1e-3)


def test_nn_all_support_invalid(rng):
    q, qm, p, _ = _clouds(rng, qn=64, pn=128)
    pm = jnp.zeros(128, bool)
    _, d2 = nn_pallas(q, qm, p, pm, interpret=True)
    assert np.all(np.asarray(d2) > 1e30)


def test_moments_parity(rng):
    q, qm, p, pm = _clouds(rng, qn=257, pn=2100)
    feats = jnp.asarray(rng.uniform(0, 1, (2100, 5)).astype(np.float32))
    r = 3.0
    ref = neighbors.radius_moments(q, qm, p, pm, r, p_feats=feats,
                                   close_fraction_sq=0.64)

    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    stack = jnp.stack([jnp.ones_like(x), x, y, z, x * x, x * y, x * z,
                       y * y, y * z, z * z], axis=1)
    stack = jnp.concatenate([stack, feats], axis=1)
    r2 = jnp.full((q.shape[0],), r * r, jnp.float32)
    sums, csums = moments_pallas(q, p, pm, r2, stack, 0.64 * r2,
                                 interpret=True)
    qmf = np.asarray(qm).astype(np.float32)[:, None]
    sums = np.asarray(sums) * qmf
    csums = np.asarray(csums) * qmf
    np.testing.assert_allclose(sums[:, 0], np.asarray(ref["count"]),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(sums[:, 1:4], np.asarray(ref["sum_xyz"]),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(sums[:, 4:10], np.asarray(ref["sum_outer"]),
                               rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(sums[:, 10:], np.asarray(ref["feat_sum"]),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(csums[:, 0], np.asarray(ref["close_count"]),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(csums[:, 10:],
                               np.asarray(ref["close_feat_sum"]),
                               rtol=1e-3, atol=1e-2)


def test_pca_moments_parity(rng):
    """The hi/lo bf16 per-tile-centered PCA moments must reproduce the f32
    covariance path to well below LiDAR sampling noise."""
    import jax.numpy as jnp
    from mulls_tpu.ops.kernels import pca_moments_pallas
    from mulls_tpu.ops import pca as pca_ops

    q, qm, p, pm = _clouds(rng, qn=300, pn=2500)
    # spatial ordering like the production call site
    qo = pca_ops.morton_order(q)
    q = q[qo]
    qm = qm[qo]
    r = 3.0
    r2 = jnp.full((q.shape[0],), r * r, jnp.float32)
    cnt, sx, so = pca_moments_pallas(q, p, pm, r2, interpret=True)
    ref = neighbors.radius_moments(q, qm, p, pm, r)
    cov_k = np.asarray(neighbors.cov_from_moments(cnt, sx, so))
    cov_r = np.asarray(neighbors.cov_from_moments(
        ref["count"], ref["sum_xyz"], ref["sum_outer"]))
    m = np.asarray(qm) & (np.asarray(ref["count"]) > 3)
    np.testing.assert_allclose(np.asarray(cnt)[np.asarray(qm)],
                               np.asarray(ref["count"])[np.asarray(qm)],
                               atol=0.5)
    np.testing.assert_allclose(cov_k[m], cov_r[m], atol=2e-2)
