"""View selection with temporal gating (tiny lax.scan over frames).

Behavioral reference: ObjTracker/pose_initializtion.py:285-321 — per frame,
pick the prior view with max masked DINO cosine, gated so the selection
does not jump too far from the previous frame:

  * top-5 candidates if the previous frame selected a prior (top-10 after a
    rejection), pick the candidate with min geodesic angle to the previous
    rotation;
  * reject (fall back to the previous rotation) if that candidate is >85
    deg from the previous rotation or from the previous selected prior;
  * after a rejection, re-accept the closest prior if it is <15 deg away,
    unless it is >30 deg from the previous selected prior or its score is
    below max(score) - std(score).

TPU design: the expensive part (the (F, N) score matrix) is batched MXU
work in tracker/priors.py; the gating itself is a data-light sequential
scan (per step: one top-k over N + a handful of angle comparisons), kept
OUT of the vmapped refine (SURVEY.md §2.3).

Two modes:
  * ``gate_all_frames`` (parallel pipeline): the scan threads the SELECTED
    rotation as "previous" — an approximation of the reference, which
    threads the previous frame's REFINED rotation (the refined pose stays
    within a few degrees of its init after 100 Adam steps, so the gate
    decisions match in practice).  This is what unlocks vmapping the
    refine across the whole video.
  * ``gate_frame`` (sequential parity mode): one step at a time, caller
    feeds back the refined rotation — bitwise-faithful to the reference
    control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import rotation_angle_difference

Array = jax.Array


class GateState(NamedTuple):
    prev_rotation: Array  # (3, 3) row-convention previous rotation
    former_idx: Array  # () int32: previous selected prior index, -1 if rejected
    has_prev: Array  # () bool: False only before the first frame


class GateResult(NamedTuple):
    rotation_init: Array  # (3, 3) row-convention init for the refine
    selected_idx: Array  # () int32 (-1 = fell back to previous rotation)


def initial_state() -> GateState:
    return GateState(jnp.eye(3), jnp.int32(-1), jnp.asarray(False))


def gate_frame(
    state: GateState, scores: Array, priors_row: Array
) -> tuple[GateState, GateResult]:
    """One gating step (pose_initializtion.py:298-321).

    Args:
      scores: (N,) masked DINO cosine of this frame vs all prior views.
      priors_row: (N, 3, 3) row-convention prior rotations
        (= render_rotations^T in the reference).

    Returns: (state with former_idx/prev_rotation updated to the SELECTED
    rotation, GateResult).  Sequential-parity callers overwrite
    ``state.prev_rotation`` with the refined rotation afterwards.
    """
    n = scores.shape[0]

    # --- first frame: plain argmax --------------------------------------
    argmax_idx = jnp.argmax(scores).astype(jnp.int32)

    # --- gated path ------------------------------------------------------
    rel = rotation_angle_difference(state.prev_rotation[None], priors_row)  # (N,)
    former_valid = state.former_idx >= 0
    former_rot = priors_row[jnp.clip(state.former_idx, 0)]
    former_rel_raw = rotation_angle_difference(former_rot[None], priors_row)
    former_rel = jnp.where(former_valid, former_rel_raw, jnp.zeros_like(former_rel_raw))
    topk_num = jnp.where(former_valid, 5, 10)

    k_max = min(10, n)
    _, top_idx = jax.lax.top_k(scores, k_max)
    pos = jnp.arange(k_max)
    cand_rel = jnp.where(pos < topk_num, rel[top_idx], jnp.inf)
    sel = top_idx[jnp.argmin(cand_rel)].astype(jnp.int32)
    rejected = (rel[sel] > 85.0) | (former_rel[sel] > 85.0)
    sel = jnp.where(rejected, -1, sel)

    # Fallback re-acceptance (affects only the NEXT frame's former_idx; the
    # rotation init stays the previous rotation).
    m = jnp.argmin(rel).astype(jnp.int32)
    score_gate = scores[m] < (jnp.max(scores) - jnp.std(scores, ddof=1))
    re_rejected = (former_valid & (former_rel[m] > 30.0)) | score_gate
    fallback_idx = jnp.where(
        jnp.min(rel) < 15.0, jnp.where(re_rejected, -1, m), jnp.int32(-1)
    )

    gated_idx = jnp.where(sel >= 0, sel, fallback_idx)
    gated_rot = jnp.where(
        sel >= 0, priors_row[jnp.clip(sel, 0)], state.prev_rotation
    )

    # --- combine first-frame vs gated ------------------------------------
    idx = jnp.where(state.has_prev, gated_idx, argmax_idx)
    rot_init = jnp.where(state.has_prev, gated_rot, priors_row[argmax_idx])

    new_state = GateState(rot_init, idx, jnp.asarray(True))
    return new_state, GateResult(rot_init, idx)


@jax.jit
def gate_all_frames(scores: Array, priors_row: Array) -> GateResult:
    """Gating scan over all frames (parallel pipeline mode).

    Args:
      scores: (F, N).
      priors_row: (N, 3, 3).

    Returns: GateResult with leading frame axis.
    """

    def step(state, s):
        new_state, res = gate_frame(state, s, priors_row)
        return new_state, res

    _, out = jax.lax.scan(step, initial_state(), scores)
    return out


# ---------------------------------------------------------------------------
# Multi-hypothesis initialization (num_initializations > 1)
# ---------------------------------------------------------------------------

class Hypotheses(NamedTuple):
    rotations: Array  # (F, K, 3, 3) row-convention rotation inits
    # (F, K) provenance: prior-view index; -1 = 180-degree flip of the gate
    # pick; -2 = gate fallback (previous rotation, no prior selected).
    indices: Array


# 180-degree camera-frame rotations about X / Y: in the row convention
# (verts @ R), a camera-frame rotation M composes as R @ M (both matrices
# are symmetric diag(+-1), so row/column transposes coincide).  These are
# the classic silhouette-preserving pose ambiguities for flat-ish objects
# — exactly the near-180-degree flip the shoes2 gate lands on
# (BASELINE.md oracle-init ablation).
_FLIP_X = np.diag(np.array([1.0, -1.0, -1.0], np.float32))
_FLIP_Y = np.diag(np.array([-1.0, 1.0, -1.0], np.float32))


def _pairwise_angle_deg(R: np.ndarray, chosen: np.ndarray) -> np.ndarray:
    """(N,) min geodesic angle (deg) of each rotation in R vs any chosen."""
    # trace(R_i @ C_j^T) over all pairs -> (N, M)
    tr = np.einsum("nab,mab->nm", R, chosen)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(cos)).min(axis=1)


def build_hypotheses(
    rotation_init: Array,
    selected_idx: Array,
    priors_row: Array,
    k: int,
    sil_scores: Array | None = None,
    include_flips: bool = True,
    min_angle_deg: float = 30.0,
) -> Hypotheses:
    """Per-frame rotation-hypothesis set for multi-init refinement.

    The reference plumbs ``num_initializations`` everywhere but never
    enables it (pose_initializtion.py:258,390 — effectively always 1,
    SURVEY.md quirks).  This builds the hypothesis set the affordance
    implies, TPU-first: all K hypotheses refine as one extra vmap axis and
    the winner is selected by final loss (tracker/refine.
    refine_poses_multihyp).

    Slot priority per frame:
      0        the gated pick (exact reference behavior);
      1, 2     its 180-degree camera-frame flips about X then Y (the
               silhouette-preserving ambiguity family) when include_flips;
      rest     greedy silhouette-IoU retrieval (priors.with_sil channel),
               skipping views within ``min_angle_deg`` of any already-
               chosen hypothesis (diversity), relaxed to plain best-
               remaining if the diverse pool runs dry; without sil scores,
               farthest-point sampling over the prior views.

    Host-side numpy: runs once per sequence over (F<=~40, N<=6000, K<=8).

    Args:
      rotation_init: (F, 3, 3) gate picks (gate_all_frames).
      selected_idx: (F,) gate indices (-1 = fallback).
      priors_row: (N, 3, 3) row-convention prior rotations.
      sil_scores: optional (F, N) silhouette-IoU score matrix.
    """
    R0 = np.asarray(rotation_init, np.float32)  # (F, 3, 3)
    sel = np.asarray(selected_idx, np.int32)
    priors = np.asarray(priors_row, np.float32)
    sil = None if sil_scores is None else np.asarray(sil_scores)
    f_frames = R0.shape[0]
    n = priors.shape[0]
    k = max(1, min(k, n + 3))

    rots = np.zeros((f_frames, k, 3, 3), np.float32)
    idxs = np.full((f_frames, k), -1, np.int32)
    for f in range(f_frames):
        chosen = [R0[f]]
        ids = [int(sel[f]) if sel[f] >= 0 else -2]
        if include_flips and len(chosen) < k:
            chosen.append(R0[f] @ _FLIP_X)
            ids.append(-1)
        if include_flips and len(chosen) < k:
            chosen.append(R0[f] @ _FLIP_Y)
            ids.append(-1)
        if len(chosen) < k:
            stack = np.stack(chosen)
            if sil is not None:
                order = np.argsort(-sil[f])
                # diverse pass, then relaxed fill
                for relax in (False, True):
                    for v in order:
                        if len(chosen) >= k:
                            break
                        if v in ids:
                            continue
                        ang = _pairwise_angle_deg(priors[v : v + 1], stack)[0]
                        if relax or ang >= min_angle_deg:
                            chosen.append(priors[v])
                            ids.append(int(v))
                            stack = np.stack(chosen)
                    if len(chosen) >= k:
                        break
            else:
                while len(chosen) < k:
                    ang = _pairwise_angle_deg(priors, stack)
                    v = int(np.argmax(ang))
                    chosen.append(priors[v])
                    ids.append(v)
                    stack = np.stack(chosen)
        rots[f] = np.stack(chosen[:k])
        idxs[f] = np.asarray(ids[:k], np.int32)
    return Hypotheses(jnp.asarray(rots), jnp.asarray(idxs))
