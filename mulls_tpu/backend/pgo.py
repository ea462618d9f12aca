"""Pose graph optimization — batched Gauss-Newton / Levenberg-Marquardt on
SE(3) with the reference's residual convention.

Replaces the reference's Ceres/g2o/GTSAM back-ends
(`src/graph_optimizer.cpp`, residual at `include/pgo/graph_optimizer.h:
98-145`): per edge (a=target/block1, b=source/block2) with measurement
T_ab = Ta^-1 Tb,

    r = [ t_ab_est - t_ab_meas ; 2 * vec(q_meas * q_ab_est^-1) ]

weighted by the square-root information matrix.  Jacobians come from
`jax.jacfwd` on the exact residual (no hand-derived approximations), batched
over edges with `vmap`; the dense 6M x 6M normal system is solved on device
(graphs are hundreds of submaps, so dense Cholesky on the MXU beats any
sparse scheme at this size).

Node freezing follows the reference's bounds trick (`graph_optimizer.cpp:
594-657`): fixed nodes contribute a huge diagonal penalty, i.e. their update
is pinned to zero.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mulls_tpu.core import se3


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph (masked edges)."""

    node_t: jnp.ndarray  # [M, 3]
    node_q: jnp.ndarray  # [M, 4] unit quaternion (w,x,y,z)
    edge_i: jnp.ndarray  # [E] int32 node a (target / block1)
    edge_j: jnp.ndarray  # [E] int32 node b (source / block2)
    edge_t: jnp.ndarray  # [E, 3] measured t_ab
    edge_q: jnp.ndarray  # [E, 4] measured q_ab
    edge_info: jnp.ndarray  # [E, 6, 6] information matrix
    edge_mask: jnp.ndarray  # [E] bool
    fixed: jnp.ndarray  # [M] bool (frozen nodes)
    # per-node parameter bounds around the INITIAL pose, the reference's
    # ceres SetParameter{Lower,Upper}Bound trick (`graph_optimizer.cpp:
    # 594-657`): stable nodes move at most +-t_limit / +-r_limit, free
    # nodes get linearly-growing limits.  None = unbounded.
    t_limit: jnp.ndarray = None  # [M] f32 meters (per component)
    r_limit: jnp.ndarray = None  # [M] f32 quaternion-component bound

    @property
    def num_nodes(self) -> int:
        return self.node_t.shape[0]


def _sqrt_psd(info: jnp.ndarray) -> jnp.ndarray:
    """Symmetric square root via eigendecomposition (6x6, batched)."""
    w, v = jnp.linalg.eigh(info)
    w = jnp.maximum(w, 0.0)
    return (v * jnp.sqrt(w)[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def _edge_residual(dt_a, dq_a, dt_b, dq_b, ta, qa, tb, qb, t_meas, q_meas):
    """Residual with local perturbations (t + delta, dq (x) q) applied."""

    def perturb(t, q, dt, dth):
        dq = jnp.concatenate([jnp.ones((1,), t.dtype), 0.5 * dth])
        qn = se3.quat_mul(dq, q)
        qn = qn / jnp.linalg.norm(qn)
        return t + dt, qn

    ta_p, qa_p = perturb(ta, qa, dt_a, dq_a)
    tb_p, qb_p = perturb(tb, qb, dt_b, dq_b)
    qa_inv = se3.quat_conj(qa_p)
    # T_ab = Ta^-1 Tb
    Ra_inv = se3.rotation_from_quat(qa_inv)
    t_ab = Ra_inv @ (tb_p - ta_p)
    q_ab = se3.quat_mul(qa_inv, qb_p)
    r_t = t_ab - t_meas
    r_q = 2.0 * se3.quat_mul(q_meas, se3.quat_conj(q_ab))[1:4]
    return jnp.concatenate([r_t, r_q])


# numpy (not jnp): a module-level device constant would initialize the
# XLA backend at import time, which breaks `jax.distributed.initialize`
# (it must run before ANY backend touch — tools/multihost_smoke.py)
_zero6 = np.zeros((3,), np.float32)


def _clamp_to_bounds(t_new, q_new, init_t, init_q, t_limit, r_limit):
    """Pull node poses back inside their per-node bounds around the initial
    values (ceres `fix_node_ceres` equivalent, `graph_optimizer.cpp:
    639-657`).  Translation bounds are per-component, exactly like ceres;
    a quaternion-component bound of r caps the rotation angle from the
    initial orientation at ~2r (small-angle), so the rotation deviation is
    capped in the tangent space."""
    if t_limit is not None:
        off = jnp.clip(t_new - init_t, -t_limit[:, None], t_limit[:, None])
        t_new = init_t + off
    if r_limit is not None:
        dq = se3.quat_mul(q_new, se3.quat_conj(init_q))
        dq = dq * jnp.sign(jnp.where(dq[:, :1] == 0.0, 1.0, dq[:, :1]))
        vn = jnp.linalg.norm(dq[:, 1:4], axis=-1)
        ang = 2.0 * jnp.arctan2(vn, dq[:, 0])
        cap = 2.0 * r_limit
        scale = jnp.minimum(1.0, cap / jnp.maximum(ang, 1e-9))
        half = 0.5 * ang * scale
        axis = dq[:, 1:4] / jnp.maximum(vn, 1e-12)[:, None]
        dq_c = jnp.concatenate([jnp.cos(half)[:, None],
                                jnp.sin(half)[:, None] * axis], axis=1)
        q_c = se3.quat_mul(dq_c, init_q)
        q_new = q_c / jnp.linalg.norm(q_c, axis=-1, keepdims=True)
    return t_new, q_new


def _edge_res_and_jac(ta, qa, tb, qb, t_meas, q_meas):
    f = lambda dta, dqa, dtb, dqb: _edge_residual(
        dta, dqa, dtb, dqb, ta, qa, tb, qb, t_meas, q_meas)
    r = f(_zero6, _zero6, _zero6, _zero6)
    Ja = jnp.concatenate(jax.jacfwd(f, argnums=(0, 1))(
        _zero6, _zero6, _zero6, _zero6), axis=1)  # [6, 6]
    Jb = jnp.concatenate(jax.jacfwd(f, argnums=(2, 3))(
        _zero6, _zero6, _zero6, _zero6), axis=1)  # [6, 6]
    return r, Ja, Jb


def _huber_cost(r, sqrt_info, mask, robust_kernel: bool, delta: float):
    """Total (optionally Huber-robustified) cost — the LM acceptance
    metric.  rho(x) = x^2 for |x| <= delta, delta*(2|x| - delta) beyond."""
    rw = jnp.einsum("eij,ej->ei", sqrt_info, r)
    rn = jnp.linalg.norm(rw, axis=-1)
    if robust_kernel:
        cost = jnp.where(rn <= delta, rn * rn,
                         delta * (2.0 * rn - delta))
    else:
        cost = rn * rn
    return jnp.sum(cost * mask.astype(jnp.float32))


@partial(jax.jit, static_argnames=("iterations", "equal_weight",
                                   "diagonal_information", "robust_kernel"))
def optimize_pose_graph(graph: PoseGraph, iterations: int = 20,
                        lm_lambda: float = 1e-4,
                        equal_weight: bool = False,
                        diagonal_information: bool = False,
                        robust_kernel: bool = False,
                        huber_delta: float = 1.0):
    """Runs ADAPTIVE Levenberg-Marquardt; returns (node_t, node_q,
    final_chi2).

    Options mirror `pgo_param_t` (`utility.hpp:743-792`): equal weights,
    diagonal-only information, Huber robustification.  Damping follows the
    classic trust-region schedule ceres uses (`graph_optimizer.cpp:450-476`
    runs ceres' LM): each proposal is ACCEPTED only if the (robustified)
    cost decreases — accepted steps shrink lambda, rejected steps keep the
    poses and grow it.  A solved graph therefore can never leave with a
    worse cost than it entered with, which replaces the round-1
    fixed-lambda fixed-iteration random walk at the noise floor.
    """
    m = graph.num_nodes
    info = graph.edge_info
    if equal_weight:
        info = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), info.shape)
    elif diagonal_information:
        info = jnp.eye(6) * info.diagonal(axis1=-2, axis2=-1)[..., None, :]
    sqrt_info = _sqrt_psd(info)

    def residuals(node_t, node_q):
        return jax.vmap(_edge_res_and_jac)(
            node_t[graph.edge_i], node_q[graph.edge_i],
            node_t[graph.edge_j], node_q[graph.edge_j],
            graph.edge_t, graph.edge_q)

    def cost_at(node_t, node_q):
        r = jax.vmap(lambda ta, qa, tb, qb, tm, qm: _edge_residual(
            _zero6, _zero6, _zero6, _zero6, ta, qa, tb, qb, tm, qm))(
            node_t[graph.edge_i], node_q[graph.edge_i],
            node_t[graph.edge_j], node_q[graph.edge_j],
            graph.edge_t, graph.edge_q)
        return _huber_cost(r, sqrt_info, graph.edge_mask, robust_kernel,
                           huber_delta)

    def step(state, _):
        node_t, node_q, lam, best_cost = state
        r, Ja, Jb = residuals(node_t, node_q)
        w_edge = graph.edge_mask.astype(jnp.float32)
        if robust_kernel:
            # Huber IRLS: effective weight delta/||r|| on H and g.  Both r
            # and J get sqrt(w), so H = w J'S'SJ and g = w J'S'Sr — scaling
            # both by w itself would square the kernel
            rw = jnp.einsum("eij,ej->ei", sqrt_info, r)
            rn = jnp.linalg.norm(rw, axis=-1)
            w_edge = w_edge * jnp.sqrt(jnp.where(
                rn > huber_delta, huber_delta / jnp.maximum(rn, 1e-9), 1.0))
        rW = jnp.einsum("eij,ej->ei", sqrt_info, r) * w_edge[:, None]
        JaW = sqrt_info @ Ja * w_edge[:, None, None]
        JbW = sqrt_info @ Jb * w_edge[:, None, None]

        # assemble dense H (6M x 6M) via scatter-add of 6x6 blocks
        Haa = jnp.einsum("eki,ekj->eij", JaW, JaW)
        Hbb = jnp.einsum("eki,ekj->eij", JbW, JbW)
        Hab = jnp.einsum("eki,ekj->eij", JaW, JbW)
        ga = jnp.einsum("eki,ek->ei", JaW, rW)
        gb = jnp.einsum("eki,ek->ei", JbW, rW)

        H = jnp.zeros((m, 6, m, 6), jnp.float32)
        ii, jj = graph.edge_i, graph.edge_j
        H = H.at[ii, :, ii, :].add(Haa)
        H = H.at[jj, :, jj, :].add(Hbb)
        H = H.at[ii, :, jj, :].add(Hab)
        H = H.at[jj, :, ii, :].add(jnp.swapaxes(Hab, -1, -2))
        g = jnp.zeros((m, 6), jnp.float32)
        g = g.at[ii].add(ga)
        g = g.at[jj].add(gb)

        # freeze nodes + LM damping
        diag_pin = jnp.where(graph.fixed, 1e10, 0.0)
        Hd = H.reshape(m * 6, m * 6)
        eye = jnp.eye(m * 6, dtype=jnp.float32)
        pin = jnp.repeat(diag_pin, 6)
        Hd = Hd + jnp.diag(pin) + lam * eye \
            + 1e-8 * eye  # keep unconstrained nodes solvable
        delta = jnp.linalg.solve(Hd, -g.reshape(-1)).reshape(m, 6)
        delta = jnp.where(graph.fixed[:, None], 0.0, delta)

        dq = jnp.concatenate([jnp.ones((m, 1), jnp.float32),
                              0.5 * delta[:, 3:6]], axis=1)
        q_new = se3.quat_mul(dq, node_q)
        q_new = q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)
        t_new = node_t + delta[:, :3]
        t_new, q_new = _clamp_to_bounds(t_new, q_new, graph.node_t,
                                        graph.node_q, graph.t_limit,
                                        graph.r_limit)
        new_cost = cost_at(t_new, q_new)
        accept = new_cost < best_cost
        t_next = jnp.where(accept, t_new, node_t)
        q_next = jnp.where(accept, q_new, node_q)
        lam_next = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                             jnp.minimum(lam * 5.0, 1e3))
        cost_next = jnp.where(accept, new_cost, best_cost)
        return (t_next, q_next, lam_next, cost_next), cost_next

    init_cost = cost_at(graph.node_t, graph.node_q)
    (t, q, _, _), _ = jax.lax.scan(
        step, (graph.node_t, graph.node_q, jnp.float32(lm_lambda),
               init_cost), None, length=iterations)
    # final chi2 (plain weighted SSE) at the RETURNED poses
    r, _, _ = jax.vmap(_edge_res_and_jac)(
        t[graph.edge_i], q[graph.edge_i], t[graph.edge_j], q[graph.edge_j],
        graph.edge_t, graph.edge_q)
    rW = jnp.einsum("eij,ej->ei", sqrt_info, r) \
        * graph.edge_mask.astype(jnp.float32)[:, None]
    return t, q, jnp.sum(rW * rW)


@partial(jax.jit, static_argnames=("iterations", "cg_iters",
                                   "robust_kernel"))
def optimize_pose_graph_cg(graph: PoseGraph, iterations: int = 15,
                           cg_iters: int = 80, lm_lambda: float = 1e-4,
                           robust_kernel: bool = False,
                           huber_delta: float = 1.0):
    """Frame-scale PGO: matrix-free Gauss-Newton/LM.

    The dense path materializes the (6M)^2 Hessian — fine for hundreds of
    submap nodes, impossible for the reference's option-A framewise pass
    over ALL frames (`mulls_slam.cpp:835-875`; KITTI-00 is 4541 frames ->
    27k^2 f32 ~ 3 GB + O(n^3)).  Here each LM step solves the normal
    equations by preconditioned conjugate gradients whose operator is
    applied EDGE-LOCALLY (gather ends, two 6x6 matvecs, scatter-add) —
    O(E) memory and work per CG iteration, block-Jacobi preconditioner
    from the per-node diagonal blocks.  Same cost-gated adaptive damping
    and bound clamping as the dense solver.  Returns (node_t, node_q,
    final_chi2)."""
    m = graph.num_nodes
    sqrt_info = _sqrt_psd(graph.edge_info)
    ii, jj = graph.edge_i, graph.edge_j
    free = (~graph.fixed).astype(jnp.float32)[:, None]  # [M,1]

    def residuals(node_t, node_q):
        return jax.vmap(_edge_res_and_jac)(
            node_t[ii], node_q[ii], node_t[jj], node_q[jj],
            graph.edge_t, graph.edge_q)

    def cost_at(node_t, node_q):
        r = jax.vmap(lambda ta, qa, tb, qb, tm, qm: _edge_residual(
            _zero6, _zero6, _zero6, _zero6, ta, qa, tb, qb, tm, qm))(
            node_t[ii], node_q[ii], node_t[jj], node_q[jj],
            graph.edge_t, graph.edge_q)
        return _huber_cost(r, sqrt_info, graph.edge_mask, robust_kernel,
                           huber_delta)

    def step(state, _):
        node_t, node_q, lam, best_cost = state
        r, Ja, Jb = residuals(node_t, node_q)
        w_edge = graph.edge_mask.astype(jnp.float32)
        if robust_kernel:
            rw = jnp.einsum("eij,ej->ei", sqrt_info, r)
            rn = jnp.linalg.norm(rw, axis=-1)
            w_edge = w_edge * jnp.sqrt(jnp.where(
                rn > huber_delta, huber_delta / jnp.maximum(rn, 1e-9), 1.0))
        rW = jnp.einsum("eij,ej->ei", sqrt_info, r) * w_edge[:, None]
        JaW = sqrt_info @ Ja * w_edge[:, None, None]
        JbW = sqrt_info @ Jb * w_edge[:, None, None]

        g = jnp.zeros((m, 6), jnp.float32)
        g = g.at[ii].add(jnp.einsum("eki,ek->ei", JaW, rW))
        g = g.at[jj].add(jnp.einsum("eki,ek->ei", JbW, rW))
        g = g * free  # fixed nodes: zero gradient (projected system)

        # block-Jacobi preconditioner from the per-node diagonal blocks
        eye6 = jnp.eye(6, dtype=jnp.float32)
        D = jnp.zeros((m, 6, 6), jnp.float32)
        D = D.at[ii].add(jnp.einsum("eki,ekj->eij", JaW, JaW))
        D = D.at[jj].add(jnp.einsum("eki,ekj->eij", JbW, JbW))
        D = D + (lam + 1e-6) * eye6
        Dinv = jnp.linalg.inv(D)

        def Hv(v):  # [M, 6] -> [M, 6], projected so fixed nodes stay put
            vp = v * free
            ua = (jnp.einsum("ekj,ej->ek", JaW, vp[ii])
                  + jnp.einsum("ekj,ej->ek", JbW, vp[jj]))  # [E, 6] rows
            out = jnp.zeros((m, 6), jnp.float32)
            out = out.at[ii].add(jnp.einsum("eki,ek->ei", JaW, ua))
            out = out.at[jj].add(jnp.einsum("eki,ek->ei", JbW, ua))
            out = (out + lam * vp) * free + v * (1.0 - free)
            return out

        def Mv(v):
            return jnp.einsum("mij,mj->mi", Dinv, v) * free \
                + v * (1.0 - free)

        delta, _ = jax.scipy.sparse.linalg.cg(Hv, -g, M=Mv,
                                              maxiter=cg_iters, tol=1e-6)
        delta = delta * free

        dq = jnp.concatenate([jnp.ones((m, 1), jnp.float32),
                              0.5 * delta[:, 3:6]], axis=1)
        q_new = se3.quat_mul(dq, node_q)
        q_new = q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)
        t_new = node_t + delta[:, :3]
        t_new, q_new = _clamp_to_bounds(t_new, q_new, graph.node_t,
                                        graph.node_q, graph.t_limit,
                                        graph.r_limit)
        new_cost = cost_at(t_new, q_new)
        accept = new_cost < best_cost
        t_next = jnp.where(accept, t_new, node_t)
        q_next = jnp.where(accept, q_new, node_q)
        lam_next = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                             jnp.minimum(lam * 5.0, 1e3))
        cost_next = jnp.where(accept, new_cost, best_cost)
        return (t_next, q_next, lam_next, cost_next), cost_next

    init_cost = cost_at(graph.node_t, graph.node_q)
    (t, q, _, _), _ = jax.lax.scan(
        step, (graph.node_t, graph.node_q, jnp.float32(lm_lambda),
               init_cost), None, length=iterations)
    r, _, _ = residuals(t, q)
    rW = jnp.einsum("eij,ej->ei", sqrt_info, r) \
        * graph.edge_mask.astype(jnp.float32)[:, None]
    return t, q, jnp.sum(rW * rW)


def wrong_edge_check(graph: PoseGraph, node_t, node_q,
                     tran_thre: float, rot_thre_deg: float):
    """Post-solve wrong-edge detection (`graph_optimizer.cpp:713-754`):
    an edge whose optimized relative pose moved beyond (tran_thre,
    rot_thre_deg) from its measurement is flagged."""
    qa = node_q[graph.edge_i]
    qb = node_q[graph.edge_j]
    ta = node_t[graph.edge_i]
    tb = node_t[graph.edge_j]
    qa_inv = se3.quat_conj(qa)
    t_ab = jnp.einsum("eij,ej->ei", se3.rotation_from_quat(qa_inv), tb - ta)
    q_ab = se3.quat_mul(qa_inv, qb)
    dt = jnp.linalg.norm(t_ab - graph.edge_t, axis=-1)
    dq = se3.quat_mul(graph.edge_q, se3.quat_conj(q_ab))
    ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(dq[:, 0]), -1.0, 1.0))
    bad = graph.edge_mask & ((dt > tran_thre)
                             | (ang > jnp.radians(rot_thre_deg)))
    return bad


@partial(jax.jit, static_argnames=("iterations", "equal_weight",
                                   "diagonal_information", "robust_kernel"))
def optimize_and_check(graph: PoseGraph, iterations: int = 20,
                       equal_weight: bool = False,
                       diagonal_information: bool = False,
                       robust_kernel: bool = False,
                       tran_thre: float = 2.0,
                       rot_thre_deg: float = 10.0) -> jnp.ndarray:
    """PGO solve + wrong-edge check in ONE dispatch, packed into ONE
    [7M + 1 + E] f32 vector (t[M,3] | q[M,4] | chi2 | bad[E]) so the host
    pays a single D2H round trip per submap boundary instead of four —
    on the tunneled chip each separate fetch costs a full link RTT."""
    t, q, chi2 = optimize_pose_graph(
        graph, iterations=iterations, equal_weight=equal_weight,
        diagonal_information=diagonal_information,
        robust_kernel=robust_kernel)
    bad = wrong_edge_check(graph, t, q, tran_thre, rot_thre_deg)
    return jnp.concatenate([t.reshape(-1), q.reshape(-1),
                            chi2.reshape(1),
                            bad.astype(jnp.float32)])


@partial(jax.jit, static_argnames=("iterations", "cg_iters",
                                   "robust_kernel"))
def optimize_and_check_cg(graph: PoseGraph, iterations: int = 20,
                          cg_iters: int = 80,
                          robust_kernel: bool = False,
                          tran_thre: float = 2.0,
                          rot_thre_deg: float = 10.0) -> jnp.ndarray:
    """iSAM-class solve + wrong-edge check in one dispatch (same packed
    [7M + 1 + E] layout as `optimize_and_check`).  Backs the
    `--pose_graph_optimization_method=gtsam` selection: a genuinely
    different linear-algebra path from the ceres/g2o dense factorization
    — matrix-free Gauss-Newton whose normal equations are solved by
    block-Jacobi-preconditioned conjugate gradients applied EDGE-LOCALLY,
    O(E) memory/work per CG pass.  Incremental in the iSAM sense that
    every boundary's solve warm-starts from the previously optimized node
    poses (the backend keeps them current), so a grown-by-one-submap
    graph converges in a few GN steps instead of a cold solve."""
    t, q, chi2 = optimize_pose_graph_cg(
        graph, iterations=iterations, cg_iters=cg_iters,
        robust_kernel=robust_kernel)
    bad = wrong_edge_check(graph, t, q, tran_thre, rot_thre_deg)
    return jnp.concatenate([t.reshape(-1), q.reshape(-1),
                            chi2.reshape(1),
                            bad.astype(jnp.float32)])


def optimize_pose_graph_sharded(graph: PoseGraph, mesh, iterations: int = 20,
                                lm_lambda: float = 1e-4,
                                axis: str = "data",
                                robust_kernel: bool = False,
                                huber_delta: float = 1.0):
    """Multi-chip PGO: EDGES are sharded over the mesh, each device builds
    the Hessian/gradient contributions of its local edges, and the reduced
    6Mx6M system is `psum`-ed and solved replicated (SURVEY.md §5.8 —
    collectives ride ICI; the dense solve stays on the MXU).

    Feature parity with the local path: Huber robust kernel and ADAPTIVE
    LM damping with cost-gated acceptance (every device computes the same
    psum-reduced cost, so accept/reject decisions are replicated and
    deterministic).  Edge count must be padded to a multiple of the mesh
    size (use ``edge_mask`` for the padding).  Returns (node_t, node_q,
    chi2)."""
    m = graph.num_nodes
    sqrt_info = _sqrt_psd(graph.edge_info)

    has_bounds = (graph.t_limit is not None) or (graph.r_limit is not None)

    def step_fn(node_t, node_q, edge_i, edge_j, edge_t, edge_q, sqrt_i,
                edge_mask, fixed, t_limit, r_limit):
        def cost_at(t, q):
            r = jax.vmap(lambda ta, qa, tb, qb, tm, qm: _edge_residual(
                _zero6, _zero6, _zero6, _zero6, ta, qa, tb, qb, tm, qm))(
                t[edge_i], q[edge_i], t[edge_j], q[edge_j], edge_t, edge_q)
            return jax.lax.psum(
                _huber_cost(r, sqrt_i, edge_mask, robust_kernel,
                            huber_delta), axis)

        def one_iter(state, _):
            t, q, lam, best_cost = state
            r, Ja, Jb = jax.vmap(_edge_res_and_jac)(
                t[edge_i], q[edge_i], t[edge_j], q[edge_j], edge_t, edge_q)
            w = edge_mask.astype(jnp.float32)
            if robust_kernel:
                rw_ = jnp.einsum("eij,ej->ei", sqrt_i, r)
                rn = jnp.linalg.norm(rw_, axis=-1)
                w = w * jnp.sqrt(jnp.where(
                    rn > huber_delta,
                    huber_delta / jnp.maximum(rn, 1e-9), 1.0))
            rW = jnp.einsum("eij,ej->ei", sqrt_i, r) * w[:, None]
            JaW = sqrt_i @ Ja * w[:, None, None]
            JbW = sqrt_i @ Jb * w[:, None, None]
            H = jnp.zeros((m, 6, m, 6), jnp.float32)
            ii, jj = edge_i, edge_j
            H = H.at[ii, :, ii, :].add(jnp.einsum("eki,ekj->eij", JaW, JaW))
            H = H.at[jj, :, jj, :].add(jnp.einsum("eki,ekj->eij", JbW, JbW))
            Hab = jnp.einsum("eki,ekj->eij", JaW, JbW)
            H = H.at[ii, :, jj, :].add(Hab)
            H = H.at[jj, :, ii, :].add(jnp.swapaxes(Hab, -1, -2))
            g = jnp.zeros((m, 6), jnp.float32)
            g = g.at[ii].add(jnp.einsum("eki,ek->ei", JaW, rW))
            g = g.at[jj].add(jnp.einsum("eki,ek->ei", JbW, rW))
            # THE collective: reduce partial normal equations over chips
            H = jax.lax.psum(H, axis)
            g = jax.lax.psum(g, axis)
            pin = jnp.repeat(jnp.where(fixed, 1e10, 0.0), 6)
            Hd = H.reshape(m * 6, m * 6) + jnp.diag(pin) \
                + (lam + 1e-8) * jnp.eye(m * 6)
            delta = jnp.linalg.solve(Hd, -g.reshape(-1)).reshape(m, 6)
            delta = jnp.where(fixed[:, None], 0.0, delta)
            dq = jnp.concatenate([jnp.ones((m, 1), jnp.float32),
                                  0.5 * delta[:, 3:6]], axis=1)
            q_new = se3.quat_mul(dq, q)
            q_new = q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)
            t_new = t + delta[:, :3]
            if has_bounds:
                t_new, q_new = _clamp_to_bounds(
                    t_new, q_new, node_t, node_q, t_limit, r_limit)
            new_cost = cost_at(t_new, q_new)
            accept = new_cost < best_cost
            t_next = jnp.where(accept, t_new, t)
            q_next = jnp.where(accept, q_new, q)
            lam_next = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                                 jnp.minimum(lam * 5.0, 1e3))
            cost_next = jnp.where(accept, new_cost, best_cost)
            return (t_next, q_next, lam_next, cost_next), cost_next

        init_cost = cost_at(node_t, node_q)
        (t, q, _, _), _ = jax.lax.scan(
            one_iter, (node_t, node_q, jnp.float32(lm_lambda), init_cost),
            None, length=iterations)
        # final chi2 at the returned poses (per-step chi2 is pre-update)
        r, _, _ = jax.vmap(_edge_res_and_jac)(
            t[edge_i], q[edge_i], t[edge_j], q[edge_j], edge_t, edge_q)
        rW = jnp.einsum("eij,ej->ei", sqrt_i, r) \
            * edge_mask.astype(jnp.float32)[:, None]
        return t, q, jax.lax.psum(jnp.sum(rW * rW), axis)

    from jax.sharding import PartitionSpec
    P_ = PartitionSpec
    sharded = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P_(), P_(), P_(axis), P_(axis), P_(axis), P_(axis),
                  P_(axis), P_(axis), P_(), P_(), P_()),
        out_specs=(P_(), P_(), P_()),
        check_vma=False)
    fn = jax.jit(sharded)
    inf = jnp.full((m,), jnp.inf, jnp.float32)  # unbounded placeholder
    return fn(graph.node_t, graph.node_q, graph.edge_i, graph.edge_j,
              graph.edge_t, graph.edge_q, sqrt_info, graph.edge_mask,
              graph.fixed,
              graph.t_limit if graph.t_limit is not None else inf,
              graph.r_limit if graph.r_limit is not None else inf)
