"""Sliding-window loop-closure hypothesis buffer + consistency vote.

TPU-native replacement for the reference's deferred closure acceptance
machinery: ``ClosureBuffer`` (``/root/reference/src/slam/closure_buffer.cpp``
— hypothesis edges ride a keyframe-age sliding window, ``:92-110``) and
``LoopClosureChecker`` (``closure_checker.cpp:33-139`` — RANSAC-like
pairwise-consistency voting: each hypothesis proposes the rigid motion that
zeroes its own error, all hypotheses are re-scored under that motion, the
one with most inliers wins, inliers get added).

The buffer is fixed-capacity arrays (age/mask per slot); the vote is a
single ``[W, W]`` batched chi2 evaluation — no push/pop of vertex estimates
(the reference mutates the graph and restores it, ``:113-137``; here the
candidate motion is applied analytically per hypothesis).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from functools import partial as _partial

# full-f32 MXU precision — see solver/gauss_newton.py rationale
_es = _partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from cg_mrslam_tpu.core.graph import PoseGraph, unpack_info
from cg_mrslam_tpu.utils import se2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClosureBuffer:
    """W hypothesis slots. ``v_old`` is the loop vertex (stable region),
    ``v_new`` the recent keyframe vertex (movable region); ``z`` measures
    old→new. ``age`` counts keyframes since insertion."""

    v_old: jax.Array   # [W] int32
    v_new: jax.Array   # [W] int32
    z: jax.Array       # [W, 3]
    info: jax.Array    # [W, 6] packed
    age: jax.Array     # [W] int32
    mask: jax.Array    # [W] bool


def empty(capacity: int) -> ClosureBuffer:
    return ClosureBuffer(
        v_old=jnp.zeros((capacity,), jnp.int32),
        v_new=jnp.zeros((capacity,), jnp.int32),
        z=jnp.zeros((capacity, 3), jnp.float32),
        info=jnp.zeros((capacity, 6), jnp.float32),
        age=jnp.zeros((capacity,), jnp.int32),
        mask=jnp.zeros((capacity,), bool),
    )


def insert(buf: ClosureBuffer, v_old, v_new, z, info,
           valid) -> ClosureBuffer:
    """Append up to K hypotheses ``[K,...]`` (masked by ``valid``) into free
    slots. Oldest entries are overwritten if the buffer is full (the
    reference instead grows unboundedly within the window — capacity is
    sized to make overflow unreachable: window × max regions × 2 twins)."""
    w = buf.mask.shape[0]
    k = valid.shape[0]
    # free slots ranked: unused first, then oldest
    slot_score = jnp.where(buf.mask, buf.age.astype(jnp.float32),
                           jnp.float32(w))
    _, slots = jax.lax.top_k(slot_score, k)          # best k target slots
    keep = valid

    def put(b, t):
        slot, ok, vo, vn, zz, ii = t
        return ClosureBuffer(
            v_old=jnp.where(ok, b.v_old.at[slot].set(vo), b.v_old),
            v_new=jnp.where(ok, b.v_new.at[slot].set(vn), b.v_new),
            z=jnp.where(ok, b.z.at[slot].set(zz), b.z),
            info=jnp.where(ok, b.info.at[slot].set(ii), b.info),
            age=jnp.where(ok, b.age.at[slot].set(0), b.age),
            mask=jnp.where(ok, b.mask.at[slot].set(True), b.mask),
        ), None

    buf, _ = jax.lax.scan(
        put, buf,
        (slots, keep, v_old, v_new, z, info),
    )
    return buf


def tick(buf: ClosureBuffer, window: int) -> ClosureBuffer:
    """One keyframe passed: ages +1, evict age ≥ window
    (reference ``closure_buffer.cpp:92-102``)."""
    age = buf.age + jnp.where(buf.mask, 1, 0)
    return dataclasses.replace(
        buf, age=age, mask=buf.mask & (age < window)
    )


class Vote(NamedTuple):
    accept: jax.Array     # [W] bool — edges to add to the graph
    n_inliers: jax.Array  # [] int32 — inlier count of the best hypothesis
    best: jax.Array       # [] int32 — index of the best hypothesis


@partial(jax.jit, static_argnames=())
def consistency_vote(buf: ClosureBuffer, poses: jax.Array, *,
                     inlier_threshold: jax.Array | float = 2.0,
                     min_inliers: jax.Array | int = 7) -> Vote:
    """The LoopClosureChecker vote, fully batched.

    Hypothesis k proposes the left motion ``T_k = (pose_old_k ∘ z_k) ∘
    pose_new_k⁻¹`` that zeroes its own error
    (``closure_checker.cpp:101-108``); every buffered edge m is re-scored
    under T_k applied to its (movable) new vertex:
    ``e = z_m⁻¹ ∘ pose_old_m⁻¹ ∘ (T_k ∘ pose_new_m)`` and
    ``chi2[k,m] = eᵀ Ω_m e`` (``:119-133``). Best k by inlier count, ties
    by total chi2 (``:62-78``); accepted edges are the best hypothesis's
    inliers when count ≥ ``min_inliers`` (``graph_slam.cpp:493-533``)."""
    p_old = poses[buf.v_old]                          # [W,3]
    p_new = poses[buf.v_new]
    T = se2.compose(se2.compose(p_old, buf.z), se2.inverse(p_new))  # [W,3]

    moved = se2.compose(T[:, None, :], p_new[None, :, :])   # [K,W,3]
    err = se2.relative(
        se2.compose(p_old[None, :, :], buf.z[None, :, :]), moved
    )                                                        # [K,W,3]
    omega = unpack_info(buf.info)                            # [W,3,3]
    c2 = _es("kwi,wij,kwj->kw", err, omega, err)

    valid = buf.mask
    inlier = valid[None, :] & (c2 < inlier_threshold)
    n_in = jnp.sum(inlier, axis=1)
    tot = jnp.sum(jnp.where(inlier, c2, 0.0), axis=1)
    n_in = jnp.where(valid, n_in, -1)                        # dead hypotheses lose
    # lexicographic (max inliers, min chi2)
    score = n_in.astype(jnp.float32) - tot / (1.0 + jnp.max(tot))
    best = jnp.argmax(score)
    ok = n_in[best] >= min_inliers
    return Vote(accept=inlier[best] & ok, n_inliers=n_in[best], best=best)


def consume(buf: ClosureBuffer, accept: jax.Array) -> ClosureBuffer:
    """Drop accepted (now-added) hypotheses from the buffer."""
    return dataclasses.replace(buf, mask=buf.mask & ~accept)


def windowed_vote(buf: ClosureBuffer, poses: jax.Array, *,
                  window: int, inlier_threshold, min_inliers):
    """One keyframe's check+update pass with the reference's exact
    cadence: the batch check FIRES only when the oldest hypothesis
    reaches age ``window-1`` (``checkList``, ``closure_buffer.cpp:
    104-110`` — i.e. once per hypothesis lifetime, just before
    eviction), after which ages advance and age ≥ window evicts
    (``updateList``, ``:92-102``). Call AFTER inserting this keyframe's
    hypotheses (the reference's addClosures → checkClosures →
    updateClosures order, ``graph_slam.cpp:487-559``).

    Returns ``(buffer after consume+tick, accept mask, Vote)``.
    """
    fire = jnp.any(buf.mask & (buf.age == window - 1))
    vote = consistency_vote(buf, poses,
                            inlier_threshold=inlier_threshold,
                            min_inliers=min_inliers)
    accept = vote.accept & fire
    out = consume(buf, accept)
    out = tick(out, window)
    return out, accept, vote


def add_accepted(g: PoseGraph, buf: ClosureBuffer,
                 accept: jax.Array, owner=0) -> PoseGraph:
    """Scatter all accepted hypothesis edges into the graph in one shot."""
    from cg_mrslam_tpu.core.graph import add_edges_masked

    return add_edges_masked(g, buf.v_old, buf.v_new, buf.z, buf.info,
                            accept, owner=owner)
