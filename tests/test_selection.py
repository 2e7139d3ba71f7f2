import jax
import jax.numpy as jnp
import numpy as np

from dynhor_tpu.tracker import selection as S
from dynhor_tpu.utils import geometry as G


def _angles_np(R1, R2):
    """R1 (3,3) vs R2 (N,3,3) geodesic degrees."""
    rel = np.einsum("ij,nkj->nik", R1, R2)
    tr = np.trace(rel, axis1=1, axis2=2)
    return np.degrees(np.arccos(np.clip(0.5 * (tr - 1), -1, 1)))


def _reference_gating_np(scores, priors):
    """Independent numpy transcription of pose_initializtion.py:298-321
    (parallel-mode semantics: prev = previously SELECTED rotation)."""
    F, N = scores.shape
    out_idx = np.zeros(F, np.int32)
    out_rot = np.zeros((F, 3, 3), np.float32)
    prev_rot = None
    former_idx = None
    for f in range(F):
        s = scores[f]
        if prev_rot is None:
            idx = int(np.argmax(s))
            rot = priors[idx]
        else:
            rel = _angles_np(prev_rot, priors)
            if former_idx != -1:
                former_rel = _angles_np(priors[former_idx], priors)
                k = 5
            else:
                former_rel = np.zeros(N)
                k = 10
            cand = np.argsort(-s)[:k]
            idx = int(cand[np.argmin(rel[cand])])
            if rel[idx] > 85.0 or former_rel[idx] > 85.0:
                idx = -1
            if idx != -1:
                rot = priors[idx]
            else:
                rot = prev_rot
                if rel.min() < 15.0:
                    idx = int(np.argmin(rel))
                    if (former_idx != -1 and former_rel[idx] > 30.0) or s[idx] < (
                        s.max() - s.std(ddof=1)
                    ):
                        idx = -1
        out_idx[f] = idx
        out_rot[f] = rot
        prev_rot = rot
        former_idx = idx
    return out_idx, out_rot


def test_gating_matches_reference_transcription():
    rng = np.random.RandomState(0)
    N, F = 60, 12
    priors = np.asarray(G.random_rotations(jax.random.PRNGKey(1), N), np.float32)
    scores = rng.rand(F, N).astype(np.float32)
    got = S.gate_all_frames(jnp.asarray(scores), jnp.asarray(priors))
    want_idx, want_rot = _reference_gating_np(scores, priors)
    np.testing.assert_array_equal(np.asarray(got.selected_idx), want_idx)
    np.testing.assert_allclose(np.asarray(got.rotation_init), want_rot, atol=1e-5)


def test_gating_smooth_trajectory_follows():
    # Scores engineered so the best prior per frame follows a smooth path:
    # gating should pick exactly the argmax (all small angles).
    key = jax.random.PRNGKey(2)
    N = 40
    priors = G.random_rotations(key, N)
    # Frame f's best prior = f (by construction adjacent priors are random,
    # so give overwhelming score to a fixed index instead).
    F = 5
    scores = np.full((F, N), 0.1, np.float32)
    for f in range(F):
        scores[f, 7] = 0.9  # same view each frame: zero relative angle
    got = S.gate_all_frames(jnp.asarray(scores), priors)
    np.testing.assert_array_equal(np.asarray(got.selected_idx), [7] * F)


def test_gating_rejection_falls_back_to_previous():
    # Frame 1's top-scored priors are all far (>85 deg) from frame 0's pick
    # and min angle is large -> idx -1, rotation falls back to previous.
    rz = np.asarray(G.roll_matrices(13))  # rotations about z, known angles
    # priors: identity-ish (index 0: roll -180... use explicit): build
    # rotations at 0, 30, ..., degrees about z.
    def rotz(deg):
        r = np.radians(deg)
        c, s = np.cos(r), np.sin(r)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    priors = np.stack(
        [rotz(0), rotz(100), rotz(120), rotz(140), rotz(160), rotz(110), rotz(130)]
    )
    scores = np.array(
        [
            [1.0, 0.1, 0.2, 0.3, 0.15, 0.12, 0.18],  # frame 0 picks index 0
            # frame 1: top-5 are all >85 deg from prev; index 0 (0 deg) has
            # the lowest score so it is not a candidate -> rejection, then
            # re-acceptance also fails on the score gate.
            [0.0, 0.9, 0.8, 0.85, 0.7, 0.75, 0.72],
        ],
        np.float32,
    )
    got = S.gate_all_frames(jnp.asarray(scores), jnp.asarray(priors))
    assert int(got.selected_idx[0]) == 0
    assert int(got.selected_idx[1]) == -1
    np.testing.assert_allclose(
        np.asarray(got.rotation_init[1]), priors[0], atol=1e-6
    )


def test_build_hypotheses_slots_flips_and_diversity():
    rng = np.random.RandomState(0)
    N, F, K = 50, 3, 5
    priors = np.asarray(G.random_rotations(jax.random.PRNGKey(1), N), np.float32)
    rot_init = priors[[2, 5, 9]]
    sel = np.array([2, 5, -1], np.int32)
    sil = rng.rand(F, N).astype(np.float32)
    hyp = S.build_hypotheses(
        jnp.asarray(rot_init), jnp.asarray(sel), jnp.asarray(priors), K,
        sil_scores=jnp.asarray(sil), min_angle_deg=30.0,
    )
    rots = np.asarray(hyp.rotations)
    idxs = np.asarray(hyp.indices)
    assert rots.shape == (F, K, 3, 3) and idxs.shape == (F, K)
    # Slot 0 = the gate pick exactly (reference behavior preserved).
    np.testing.assert_allclose(rots[:, 0], rot_init, atol=1e-6)
    np.testing.assert_array_equal(idxs[:, 0], [2, 5, -2])
    for f in range(F):
        # Slots 1/2 are the 180-degree flips of the gate pick.
        for j in (1, 2):
            assert idxs[f, j] == -1
            ang = _angles_np(rots[f, 0], rots[f, j : j + 1])[0]
            # arccos is ill-conditioned at cos=-1: f32 trace noise of ~1e-7
            # moves the angle by ~0.02 deg.
            np.testing.assert_allclose(ang, 180.0, atol=0.1)
            # still a proper rotation
            np.testing.assert_allclose(
                rots[f, j] @ rots[f, j].T, np.eye(3), atol=1e-5
            )
            assert np.linalg.det(rots[f, j]) > 0.9
        # Sil-retrieved slots are real prior indices, mutually diverse.
        for j in (3, 4):
            assert 0 <= idxs[f, j] < N
            np.testing.assert_allclose(rots[f, j], priors[idxs[f, j]], atol=1e-6)
        others = np.concatenate([rots[f, :3], rots[f, 3:4]])
        ang4 = _angles_np(rots[f, 4], others).min()
        # 50 random views: the diverse pool should not be exhausted.
        assert ang4 >= 30.0 - 1e-3


def test_build_hypotheses_k1_and_fps_fallback():
    priors = np.asarray(G.random_rotations(jax.random.PRNGKey(2), 30), np.float32)
    rot_init = priors[[4]]
    sel = np.array([4], np.int32)
    one = S.build_hypotheses(
        jnp.asarray(rot_init), jnp.asarray(sel), jnp.asarray(priors), 1
    )
    assert np.asarray(one.rotations).shape == (1, 1, 3, 3)
    np.testing.assert_allclose(np.asarray(one.rotations)[0, 0], priors[4], atol=1e-6)
    # No sil channel: remaining slots fill by farthest-point sampling.
    fps = S.build_hypotheses(
        jnp.asarray(rot_init), jnp.asarray(sel), jnp.asarray(priors), 5,
        sil_scores=None,
    )
    idxs = np.asarray(fps.indices)[0]
    rots = np.asarray(fps.rotations)[0]
    assert idxs[0] == 4 and idxs[1] == -1 and idxs[2] == -1
    assert 0 <= idxs[3] < 30 and 0 <= idxs[4] < 30 and idxs[3] != idxs[4]
    # FPS picks are far from everything chosen before them.
    ang = _angles_np(rots[3], rots[:3]).min()
    assert ang > 30.0


def test_gate_frame_sequential_api():
    priors = G.random_rotations(jax.random.PRNGKey(3), 20)
    scores = jnp.asarray(np.random.RandomState(1).rand(20).astype(np.float32))
    state = S.initial_state()
    state, res = S.gate_frame(state, scores, priors)
    assert int(res.selected_idx) == int(jnp.argmax(scores))
    # Caller can override prev_rotation with the refined one.
    refined = G.random_rotations(jax.random.PRNGKey(4), 1)[0]
    state = state._replace(prev_rotation=refined)
    state2, res2 = S.gate_frame(state, scores, priors)
    assert res2.rotation_init.shape == (3, 3)
