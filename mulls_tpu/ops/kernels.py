"""Pallas TPU kernels for the two hot neighborhood ops.

Both ops are tiled brute-force distance computations (the kd-tree
replacement, SURVEY.md §7.1).  The plain-XLA fallbacks in
:mod:`mulls_tpu.ops.neighbors` materialize a ``[Q, P]`` distance block per
chunk in HBM (~160 MB per ICP iteration at KITTI sizes, ~1.6 GB per frame
for the PCA neighborhoods).  These kernels keep each ``[TQ, TP]`` distance
tile in VMEM and fuse the consumer (argmin merge / moment matmul) into the
same tile pass, so the distance matrix never touches HBM:

* :func:`nn_pallas` — 1-NN with a running (dist, idx) argmin across
  support tiles (replaces the per-class correspondence search of
  `cregistration.hpp:1701-1835` and the map-side 1-NN of
  `map_manager.cpp:145-256`).
* :func:`moments_pallas` — masked neighborhood sums ``adj @ feats`` where
  ``adj = [d2 <= r2]`` (replaces the kd-tree radius search feeding
  neighborhood PCA `pca.hpp:294-354` and the NCC descriptor counts
  `cfilter.hpp:1071-1181`).

Tile sizes: TQ=256 sublanes x TP=2048 lanes (f32 min tile 8x128); the
distance tile is 2 MB of VMEM.  The moment reduction is
``[TQ,TP] @ [TP,C]``.  Coordinates stay f32 (bf16's 8-bit mantissa
cannot represent metre-scale coordinates to the mm accuracy the
registration needs).

Round-5 distance path: the squared distance (and its radius threshold)
is emitted by ONE augmented K=8 MXU matmul —
``[-2q, q2 - r2, 1] @ [p; 1; p2]`` = d2 - r2 — instead of
``cross`` + VPU broadcast-adds.  The measured round-4 floor was NOT the
matmuls but the [TQ]-vector lane-broadcasts (q2[:,None], r2[:,None],
p2 row) feeding the elementwise d2: the d2+adjacency-only variant cost
4.94 of the 5.59 ms pass (tools/perf_mfu_roofline.py).  Folding them
into the MXU pass cut pca-moments 20k x 20k from 5.59 to 2.7 ms with
bit-identical adjacency (f32 accumulation throughout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38

TQ = 256
TP = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_to(x: jnp.ndarray, n: int, axis: int = 0, value=0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# --------------------------------------------------------------------------
# 1-NN
# --------------------------------------------------------------------------

def _aug_q(q: jnp.ndarray, minus: jnp.ndarray = None) -> jnp.ndarray:
    """Query side of the augmented distance matmul:
    ``[-2q | q2 - minus | 1 | 0..]`` [N, 8], so that
    ``qa @ pa = d2 - minus`` in one K=8 MXU pass."""
    n = q.shape[0]
    q2 = jnp.sum(q * q, axis=1)
    col3 = q2 - (0.0 if minus is None else minus)
    return jnp.concatenate([
        -2.0 * q, col3[:, None], jnp.ones((n, 1), jnp.float32),
        jnp.zeros((n, 3), jnp.float32)], axis=1)


def _aug_p(p: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Support side of the augmented distance matmul: ``[p; 1; p2; 0..]``
    [8, N] (``p2`` carries the +BIG invalid-support sentinel)."""
    n = p.shape[0]
    return jnp.concatenate([
        p.T, jnp.ones((1, n), jnp.float32), p2[None, :],
        jnp.zeros((3, n), jnp.float32)], axis=0)


def _nn_kernel(qa_ref, pa_ref, d_ref, i_ref):
    # d_ref/i_ref hold the FULL [nQ, TQ] result in VMEM (tiny: 4 B/query);
    # row `i` is this q-tile's running argmin state across support tiles.
    i = pl.program_id(0)
    j = pl.program_id(1)

    # ONE augmented matmul emits the whole d2 tile (see module docstring)
    d2 = jnp.dot(qa_ref[:], pa_ref[:],
                 preferred_element_type=jnp.float32)   # [TQ, TP]

    loc_min = jnp.min(d2, axis=1)                  # [TQ]
    loc_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * TP

    prev_d = jnp.where(j == 0, _BIG, d_ref[i, :])
    prev_i = jnp.where(j == 0, 0, i_ref[i, :])
    better = loc_min < prev_d
    d_ref[i, :] = jnp.where(better, loc_min, prev_d)
    i_ref[i, :] = jnp.where(better, loc_arg, prev_i)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_pallas(q_xyz: jnp.ndarray, q_mask: jnp.ndarray, p_xyz: jnp.ndarray,
              p_mask: jnp.ndarray, interpret: bool = False):
    """Fused 1-NN: (idx [Q] i32, sqdist [Q] f32); invalid support excluded,
    invalid queries get the +inf sentinel (API parity with
    ``neighbors.nearest_neighbor``)."""
    qn, pn = q_xyz.shape[0], p_xyz.shape[0]
    qp, pp = _round_up(qn, TQ), _round_up(pn, TP)
    q = _pad_to(q_xyz.astype(jnp.float32), qp)
    p = _pad_to(p_xyz.astype(jnp.float32), pp)
    # invalid support columns get +BIG so they never win the argmin
    p2 = jnp.sum(p * p, axis=1) + jnp.where(
        _pad_to(p_mask, pp, value=False), 0.0, _BIG)

    grid = (qp // TQ, pp // TP)
    best_d, best_i = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TP), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qp // TQ, TQ), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp // TQ, TQ), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp // TQ, TQ), jnp.float32),
            jax.ShapeDtypeStruct((qp // TQ, TQ), jnp.int32),
        ],
        interpret=interpret,
    )(_aug_q(q), _aug_p(p, p2))

    idx = best_i.reshape(-1)[:qn]
    d2 = best_d.reshape(-1)[:qn]
    d2 = jnp.where(q_mask, d2, _BIG)
    return jnp.minimum(idx, pn - 1), d2


# --------------------------------------------------------------------------
# Radius moments (adjacency @ features), with optional close-neighborhood
# --------------------------------------------------------------------------

def _moments_kernel(qa_ref, pa_ref, dcr2_ref, f_ref, s_ref, c_ref=None):
    """c_ref=None compiles the single-matmul variant: the hot PCA pass
    needs no close-neighborhood sums, so the second [TQ,TP]@[TP,C] matmul
    and its HBM output are elided at trace time.  The augmented matmul
    emits ``sm = d2 - r2`` directly; the close test is
    ``sm <= close_r2 - r2`` (dcr2) — the one remaining lane-broadcast."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)
        if c_ref is not None:
            c_ref[:] = jnp.zeros(c_ref.shape, jnp.float32)

    sm = jnp.dot(qa_ref[:], pa_ref[:],
                 preferred_element_type=jnp.float32)  # [TQ,TP] = d2 - r2

    f = f_ref[:]
    # the adjacency is exactly 0/1 (bf16-exact); when the caller shipped a
    # bf16 feature stack the matmul runs at full bf16 MXU rate with f32
    # accumulation
    adj = (sm <= 0.0).astype(f.dtype)
    # the package sets jax_default_matmul_precision=float32 for the f32
    # geometry path; bf16 operands need DEFAULT or Mosaic rejects the
    # fp32-precision bf16 matmul ("Bad lhs type")
    prec = (jax.lax.Precision.DEFAULT if f.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    s_ref[:] += jnp.dot(adj, f, preferred_element_type=jnp.float32,
                        precision=prec)

    if c_ref is not None:
        dcr2 = dcr2_ref[i, :][:, None]               # [TQ, 1] cr2 - r2
        cadj = adj * (sm <= dcr2).astype(f.dtype)
        c_ref[:] += jnp.dot(cadj, f, preferred_element_type=jnp.float32,
                            precision=prec)


@functools.partial(jax.jit, static_argnames=("interpret", "with_close",
                                              "matmul_dtype"))
def moments_pallas(q_xyz: jnp.ndarray, p_xyz: jnp.ndarray,
                   p_mask: jnp.ndarray, r2: jnp.ndarray,
                   feat_stack: jnp.ndarray, close_r2: jnp.ndarray = None,
                   interpret: bool = False, with_close: bool = True,
                   matmul_dtype: str = "f32"):
    """Fused ``adj @ feat_stack`` neighborhood sums.

    Args:
      q_xyz: [Q,3] queries; r2: [Q] per-query squared radius.
      p_xyz/p_mask: [P,3]/[P] support; invalid rows contribute nothing
        (their feature rows are zeroed here, including the count column).
      feat_stack: [P,C] per-support features (col 0 is conventionally 1s).
      close_r2: [Q] absolute squared close-radius; the second output sums
        over d2 <= min(r2, close_r2).

    Returns (sums [Q,C], close_sums [Q,C]).
    """
    qn, pn = q_xyz.shape[0], p_xyz.shape[0]
    cn = feat_stack.shape[1]
    qp, pp = _round_up(qn, TQ), _round_up(pn, TP)
    cp = _round_up(cn, 128)
    q = _pad_to(q_xyz.astype(jnp.float32), qp)
    p = _pad_to(p_xyz.astype(jnp.float32), pp)
    f = _pad_to(_pad_to(
        feat_stack.astype(jnp.float32)
        * p_mask[:, None].astype(jnp.float32), pp), cp, axis=1)
    if matmul_dtype == "bf16":
        # caller asserts the stack's magnitudes tolerate 8-bit mantissas
        # (e.g. one-hot class counts, small-int intensities) — NOT safe for
        # the second-moment coordinate columns feeding covariance
        f = f.astype(jnp.bfloat16)
    # push padded/invalid support out of every radius
    p2 = jnp.sum(p * p, axis=1) + jnp.where(
        _pad_to(p_mask, pp, value=False), 0.0, _BIG)
    r2p = _pad_to(r2.astype(jnp.float32), qp)
    if close_r2 is None:
        close_r2 = jnp.zeros_like(r2)
    cr2p = _pad_to(jnp.broadcast_to(
        jnp.asarray(close_r2, jnp.float32), (qn,)), qp)

    grid = (qp // TQ, pp // TP)
    out_spec = pl.BlockSpec((TQ, cp), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((qp, cp), jnp.float32)
    outs = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TP), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp // TQ, TQ), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, cp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * (2 if with_close else 1),
        out_shape=[out_shape] * (2 if with_close else 1),
        interpret=interpret,
    )(_aug_q(q, minus=r2p), _aug_p(p, p2),
      (cr2p - r2p).reshape(qp // TQ, TQ), f)
    sums = outs[0]
    csums = outs[1] if with_close else jnp.zeros_like(outs[0])

    return sums[:qn, :cn], csums[:qn, :cn]


# --------------------------------------------------------------------------
# PCA moments: per-query-tile centered, hi/lo-split bf16 MXU path
# --------------------------------------------------------------------------

def _pca_moments_kernel(qa_ref, pa_ref, s_ref):
    """Covariance moments at full bf16 MXU rate.

    The covariance is shift-invariant, so the 10 moment features
    [1, x, y, z, xx, xy, xz, yy, yz, zz] are built IN-KERNEL from support
    coordinates centered at the query tile's mean and split hi/lo into two
    bf16 halves (f32 = hi + lo with ~16 effective mantissa bits).  With
    spatially-ordered queries (Morton, see ops.pca) the centered
    magnitudes stay small enough that the quantization noise on the
    covariance is orders below LiDAR sampling noise.  PER-TILE centering
    is load-bearing: a round-5 experiment that precomputed the stack
    about the GLOBAL support centroid (to skip the in-kernel build)
    silently destroyed planarity estimation — at 65 m magnitudes the
    second-moment quantization (~2.5e-4 m^2 even with a 3-way bf16
    split) swamps the lambda_3 of a clean plane fit (~1e-4 m^2), and
    highway drift exploded 0.08% -> 19% with zero failed frames.  The
    adjacency rides the augmented K=8 matmul (``sm = d2 - r2``, exact
    f32 accumulation).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)

    qa = qa_ref[:]                     # [TQ, 8] = [-2q | q2 - r2 | 1 | 0]
    sm = jnp.dot(qa, pa_ref[:], preferred_element_type=jnp.float32)
    adj = (sm <= 0.0).astype(jnp.bfloat16)         # [TQ, TP]

    # recover the query tile's center from the augmentation (q = -qa/2);
    # deterministic per i (same for all j); support coords are pa rows 0-2
    c = jnp.mean(-0.5 * qa[:, :3], axis=0)
    px = pa_ref[0:1, :] - c[0]         # [1, TP] centered support coords
    py = pa_ref[1:2, :] - c[1]
    pz = pa_ref[2:3, :] - c[2]
    f10 = jnp.concatenate(
        [jnp.ones_like(px), px, py, pz,
         px * px, px * py, px * pz, py * py, py * pz, pz * pz],
        axis=0).T                      # [TP, 10] f32
    hi = f10.astype(jnp.bfloat16)
    lo = (f10 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    fh = jnp.concatenate([hi, lo], axis=1)         # [TP, 20]
    fh = jnp.pad(fh, ((0, 0), (0, 128 - 20)))
    s_ref[:] += jnp.dot(adj, fh, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pca_moments_pallas(q_xyz: jnp.ndarray, p_xyz: jnp.ndarray,
                       p_mask: jnp.ndarray, r2: jnp.ndarray,
                       interpret: bool = False):
    """Returns (count [Q], mean-shifted sum_xyz [Q,3], sum_outer [Q,6]) —
    moments about a per-tile center; feed straight into cov_from_moments
    (covariance is shift-invariant)."""
    qn, pn = q_xyz.shape[0], p_xyz.shape[0]
    qp, pp = _round_up(qn, TQ), _round_up(pn, TP)
    q = _pad_to(q_xyz.astype(jnp.float32), qp)
    p = _pad_to(p_xyz.astype(jnp.float32), pp)
    p2 = jnp.sum(p * p, axis=1) + jnp.where(
        _pad_to(p_mask, pp, value=False), 0.0, _BIG)
    r2p = _pad_to(r2.astype(jnp.float32), qp)

    grid = (qp // TQ, pp // TP)
    s = pl.pallas_call(
        _pca_moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TP), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), jnp.float32),
        interpret=interpret,
    )(_aug_q(q, minus=r2p), _aug_p(p, p2))
    m = s[:qn, :10] + s[:qn, 10:20]    # hi + lo halves
    return m[:, 0], m[:, 1:4], m[:, 4:10]
