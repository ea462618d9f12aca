"""NCC keypoint descriptor matching (reference
`find_feature_correspondence_ncc`, `cregistration.hpp:409-601`).

Descriptors are the 11-dim vectors produced by the feature extractor
(close/far neighborhood-category percentages, normalized mean neighborhood
intensity, curvature, height-above-ground).  Matching is a dense L1 distance
table — one [T, S] reduction on device — with either reciprocal-NN filtering
or the fixed-top-k mode with per-point usage caps.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mulls_tpu.core.cloud import VertexDescriptors

_BIG = 3.0e38


class NccMatches(NamedTuple):
    t_idx: jnp.ndarray  # [K] target keypoint index
    s_idx: jnp.ndarray  # [K] source keypoint index
    valid: jnp.ndarray  # [K]
    dist: jnp.ndarray  # [K] L1 descriptor distance


def _norm_intensity(vec, t_vec, t_mask):
    """Index 8 holds the raw mean neighborhood intensity; normalize both
    sides with the *target* min/max like the reference
    (`cregistration.hpp:436-487`)."""
    t_int = t_vec[:, 8]
    imin = jnp.min(jnp.where(t_mask, t_int, _BIG))
    imax = jnp.max(jnp.where(t_mask, t_int, -_BIG))
    rng = jnp.maximum(imax - imin, 1e-6)
    return vec.at[:, 8].set((vec[:, 8] - imin) / rng * 255.0)


@partial(jax.jit, static_argnames=("fixed_num_corr", "corr_num",
                                   "reciprocal", "max_corr_num"))
def match_ncc(target: VertexDescriptors, source: VertexDescriptors,
              fixed_num_corr: bool = True, corr_num: int = 1000,
              reciprocal: bool = False, max_corr_num: int = 6) -> NccMatches:
    t_vec = _norm_intensity(target.vec, target.vec, target.mask)
    s_vec = _norm_intensity(source.vec, target.vec, target.mask)
    # dense L1 table [T, S]
    d = jnp.sum(jnp.abs(t_vec[:, None, :] - s_vec[None, :, :]), axis=-1)
    d = jnp.where(target.mask[:, None] & source.mask[None, :], d, _BIG)

    tn, sn = d.shape
    if not fixed_num_corr:
        # per-target best source + optional reciprocal check
        best_s = jnp.argmin(d, axis=1).astype(jnp.int32)
        best_val = jnp.take_along_axis(d, best_s[:, None], axis=1)[:, 0]
        valid = target.mask & (best_val < _BIG)
        if reciprocal:
            col_min = jnp.min(d, axis=0)
            valid = valid & (best_val <= col_min[best_s])
        return NccMatches(t_idx=jnp.arange(tn, dtype=jnp.int32),
                          s_idx=best_s, valid=valid, dist=best_val)

    # fixed-number mode: globally smallest corr_num entries with usage caps
    k = min(corr_num, tn * sn)
    flat = d.reshape(-1)
    neg_top, flat_idx = jax.lax.top_k(-flat, k)
    vals = -neg_top
    ti = (flat_idx // sn).astype(jnp.int32)
    si = (flat_idx % sn).astype(jnp.int32)

    # usage caps (max_corr_num per point on either side), sequential greedy
    # over the k sorted candidates (`cregistration.hpp:567-586`) as a scan
    def body(carry, x):
        cnt_t, cnt_s = carry
        t, s, v = x
        ok = (v < _BIG) & (cnt_t[t] < max_corr_num) & (cnt_s[s] < max_corr_num)
        cnt_t = cnt_t.at[t].add(jnp.where(ok, 1, 0))
        cnt_s = cnt_s.at[s].add(jnp.where(ok, 1, 0))
        return (cnt_t, cnt_s), ok

    (_, _), keep = jax.lax.scan(
        body,
        (jnp.zeros((tn,), jnp.int32), jnp.zeros((sn,), jnp.int32)),
        (ti, si, vals))
    return NccMatches(t_idx=ti, s_idx=si, valid=keep, dist=vals)
