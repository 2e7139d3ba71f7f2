"""End-to-end pose-tracking pipeline (reference: ObjTracker/run.py).

Host side: sequence loading (rgb + SAM segmentation channels), per-frame
crop/occlusion preprocessing with EXACT adaptive ROIAlign (numpy — this
runs once, off the hot path).  Device side: one fused prior-scoring jit,
the gating scan, the vmapped refine and the joint optimizer.

Two refine modes (system.parallel_refine):
  * True  (default): gating on selected rotations, then ALL frames refined
    in one vmapped Adam loop — the TPU-native design (SURVEY.md §2.3).
  * False: sequential per-frame loop threading the REFINED rotation into
    the next frame's gate — control-flow-faithful to the reference
    (pose_initializtion.py:404-457).
"""
from __future__ import annotations

import dataclasses
import glob as globlib
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.artifacts import Board, copy_config, save_pose_npzs
from ..io.config import experiment_dir
from ..models import dino as dino_mod
from ..ops.roi_align import crop_mask_bool_np, roi_align_exact_np
from ..utils import bbox as bboxu
from ..utils import camera as cam
from ..utils import geometry as G
from ..utils import masks as masksu
from ..utils.profiling import Profiler
from ..utils.objio import MeshData, load_obj
from . import jointopt as J
from . import priors as P
from . import refine as RF
from . import selection as S

Array = jax.Array


# ---------------------------------------------------------------------------
# Host-side data loading & preprocessing
# ---------------------------------------------------------------------------

class SequenceData(NamedTuple):
    frame_ids: list[str]
    images: np.ndarray  # (F, H, W, 3) uint8
    obj_masks: np.ndarray  # (F, H, W) bool
    hand_masks: np.ndarray  # (F, H, W) bool


def load_sequence(dataroot: str) -> SequenceData:
    """Load rgb/*.jpg|png + sam_seg/*.png (run.py:74-88,99).

    SAM channel convention (run.py:84-85): G==255 -> object, B==255 -> hand.
    The reference globs '*.jpg' although its README documents '.png'
    (SURVEY.md quirks) — we accept both.
    """
    from PIL import Image

    rgb_dir = os.path.join(dataroot, "rgb")
    paths = sorted(globlib.glob(os.path.join(rgb_dir, "*.jpg")))
    if not paths:
        paths = sorted(globlib.glob(os.path.join(rgb_dir, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no rgb frames under {rgb_dir}")
    frame_ids = [os.path.basename(p)[:-4] for p in paths]
    images, obj_masks, hand_masks = [], [], []
    for p, fid in zip(paths, frame_ids):
        images.append(np.asarray(Image.open(p).convert("RGB")))
        seg_path = os.path.join(dataroot, "sam_seg", fid + ".png")
        seg = np.asarray(Image.open(seg_path))
        obj_masks.append(seg[:, :, 1] == 255)
        hand_masks.append(seg[:, :, -1] == 255)
    return SequenceData(
        frame_ids, np.stack(images), np.stack(obj_masks), np.stack(hand_masks)
    )


class FrameAnnotations(NamedTuple):
    bbox_xywh: np.ndarray  # (F, 4) tight object bbox, full-image pixels
    square_xyxy: np.ndarray  # (F, 4) expanded square crop box
    crop_images: np.ndarray  # (F, 3, S, S) float32 [0,1], white outside mask
    target_masks: np.ndarray  # (F, S, S) float32 {-1, 0, 1}


def process_frames(
    seq: SequenceData, crop_size: int = 256, bbox_expansion: float = 0.3
) -> FrameAnnotations:
    """Per-frame crops + occlusion-aware targets (run.py:26-72).

    Exact detectron2 ROIAlign semantics via the adaptive numpy path
    (sampling_ratio=0, aligned=True).
    """
    f, h, w = seq.obj_masks.shape
    bboxes, squares, crops, targets = [], [], [], []
    for i in range(f):
        om = seq.obj_masks[i]
        nz = np.nonzero(om)
        if len(nz[0]) == 0:
            raise ValueError(f"frame {seq.frame_ids[i]}: empty object mask")
        min_row = max(nz[0].min() - 5.0, 0)
        max_row = min(nz[0].max() + 5.0, h)
        min_col = max(nz[1].min() - 5.0, 0)
        max_col = min(nz[1].max() + 5.0, w)
        box_xyxy = np.array([min_col, min_row, max_col, max_row], np.float32)
        bbox_xywh = np.asarray(bboxu.bbox_xy_to_wh(box_xyxy))
        sq_xywh = np.asarray(bboxu.make_bbox_square(bbox_xywh, bbox_expansion))
        sq_xyxy = np.asarray(bboxu.bbox_wh_to_xy(sq_xywh)).astype(np.float32)

        crop_mask = crop_mask_bool_np(om.astype(np.float32), sq_xyxy, crop_size)
        img = seq.images[i].astype(np.float32).transpose(2, 0, 1) / 255.0
        crop_img = roi_align_exact_np(img, sq_xyxy, crop_size)
        crop_img = np.where(crop_mask[None], crop_img, 1.0)

        hand_crop = crop_mask_bool_np(
            seq.hand_masks[i].astype(np.float32), sq_xyxy, crop_size
        )
        # Tri-valued target (utils/masks.add_occlusions semantics) in pure
        # numpy: per-frame device dispatches here paid a remote-compile
        # round trip each BEFORE the pipeline started (measured 174 s of
        # host preprocessing on axon; host work must stay on the host).
        target = np.where(hand_crop, -1.0, 0.0)
        target = np.where(crop_mask, 1.0, target)

        bboxes.append(bbox_xywh)
        squares.append(sq_xyxy)
        crops.append(crop_img)
        targets.append(target.astype(np.float32))
    return FrameAnnotations(
        np.stack(bboxes).astype(np.float32),
        np.stack(squares),
        np.stack(crops).astype(np.float32),
        np.stack(targets),
    )


def load_mesh(obj_path: str, normalize: bool = True) -> MeshData:
    """Load + optionally normalize the template mesh (run.py:107-117).

    Pure numpy (host path — see process_frames note)."""
    mesh = load_obj(obj_path)
    verts = np.asarray(mesh.verts, np.float32)
    if normalize:
        verts = verts - verts.mean(axis=0, keepdims=True)
        verts = (verts / np.linalg.norm(verts, axis=1).max() * 0.5).astype(np.float32)
    return dataclasses.replace(mesh, verts=verts)


# ---------------------------------------------------------------------------
# Device-side orchestration
# ---------------------------------------------------------------------------

class TrackResult(NamedTuple):
    rotations_row: np.ndarray  # (F, 3, 3) final row-convention rotations
    translations: np.ndarray  # (F, 1, 3)
    init_rotations_row: np.ndarray  # (F, 3, 3) stage-1 output (pre-joint)
    init_translations: np.ndarray
    selected_idx: np.ndarray  # (F,) prior view chosen by gating
    K: np.ndarray  # (3, 3) full-image intrinsics
    K_rois: np.ndarray  # (F, 3, 3) crop intrinsics (pixel units)
    history: dict[str, np.ndarray]  # joint-opt loss curves
    refine_loss: np.ndarray  # (F,) final stage-1 losses
    refine_iou: np.ndarray  # (F,)


def _mesh_arrays(mesh: MeshData) -> RF.MeshArrays:
    return RF.MeshArrays(
        verts=jnp.asarray(mesh.verts),
        faces=jnp.asarray(mesh.faces),
        face_uvs=jnp.asarray(mesh.face_uvs),
        texture=jnp.asarray(mesh.texture),
    )


def track_sequence(
    config: dict[str, Any],
    seq: SequenceData,
    ann: FrameAnnotations,
    mesh: MeshData,
    dino_params=None,
    dino_cfg: dino_mod.DinoConfig | None = None,
    board: Board | None = None,
    profiler: Profiler | None = None,
) -> TrackResult:
    """Stage 1 (init + refine) + stage 2 (joint) for a whole sequence."""
    prof = profiler or Profiler(enabled=bool(config["system"].get("profile", True)))
    sysc = config["system"]
    s = int(sysc["crop_size"])
    f_frames, h, w = seq.obj_masks.shape

    if dino_params is None:
        dino_params, dino_cfg = dino_mod.load_params(
            sysc["dino"].get("checkpoint"),
            dino_mod.config_for_model(
                sysc["dino"].get("model", "dinov2_vitb14"),
                smaller_edge_size=int(sysc["dino"]["smaller_edge_size"]),
            ),
        )

    K_full = np.asarray(cam.intrinsics_from_image(h, w, float(sysc["focal_factor"])))
    mesh_arrays = _mesh_arrays(mesh)

    # ---- prior views: fused render->crop->DINO->score ----
    pc = sysc["prior"]
    prior_cfg = P.PriorConfig(
        num_views=int(pc["num_views"]),
        render_h=int(pc["render_hw"][0]),
        render_w=int(pc["render_hw"][1]),
        distance_scale=float(pc["distance_scale"]),
        crop_size=s,
        bbox_expansion=float(sysc["bbox_expansion"]),
        view_chunk=int(pc["view_chunk"]),
        face_chunk=int(sysc["face_chunk"]),
        max_faces_per_tile=int(pc.get("max_faces_per_tile", 1280)),
        grid=None if config.get("random_render", True) else tuple(pc["grid"]),
    )
    key = jax.random.PRNGKey(int(pc.get("seed", 0)))
    view_rots = P.prior_view_rotations(key, prior_cfg)  # (N, 3, 3) world->cam
    priors_row = jnp.swapaxes(view_rots, -1, -2)  # row convention

    with prof.phase("frame-features"):
        gt_feats, cos_masks = P.frame_gt_features(
            dino_params, dino_cfg, jnp.asarray(ann.crop_images), jnp.asarray(ann.target_masks)
        )
        jax.block_until_ready(gt_feats)
    radius, _ = P.mesh_radius_center(mesh_arrays.verts)  # camera-distance radius
    window = P.compute_window(
        prior_cfg, float(P.mesh_norm_radius(mesh_arrays.verts)),
        float(prior_cfg.distance_scale * radius),
    )
    # Shard the view axis over the local devices when more than one is
    # visible (SURVEY.md §2.3 "views" axis); single-chip runs unchanged.
    n_dev_cfg = sysc.get("devices")
    n_dev = len(jax.devices()) if n_dev_cfg is None else min(
        int(n_dev_cfg), len(jax.devices())
    )
    if n_dev > 1:
        from ..parallel.mesh import make_mesh

        view_mesh = make_mesh(n_dev, "views")
    else:
        view_mesh = None
    # Multi-hypothesis init (num_initializations, reference
    # pose_initializtion.py:258,390 — plumbed there, never enabled): when
    # K > 1 the scoring pass also returns the silhouette-IoU retrieval
    # channel that seeds the extra hypotheses (selection.build_hypotheses).
    num_init = int(sysc.get("num_initializations", 1))
    hypc = sysc.get("hypotheses") or {}
    with_sil = num_init > 1 and bool(hypc.get("sil_retrieval", True))
    sil_scores = None
    with prof.phase("prior-scoring"):
        ps = pc.get("prescreen") or {}
        if bool(ps.get("enabled", True)):
            out = P.prior_scores_two_stage(
                dino_params, dino_cfg, mesh_arrays.verts, mesh_arrays.faces,
                mesh_arrays.face_uvs, mesh_arrays.texture, view_rots,
                jnp.asarray(ann.crop_images), jnp.asarray(ann.target_masks),
                gt_feats, cos_masks, prior_cfg, window,
                host_batch=int(pc.get("host_batch", 1000)),
                prescreen_edge=int(ps.get("edge", 112)),
                prescreen_scale=int(ps.get("scale", 2)),
                topk=int(ps.get("topk", 24)),
                view_mesh=view_mesh,
                with_sil=with_sil,
            )
        else:
            sil_masks = None
            if with_sil:
                from .priors import SIL_RES
                from ..ops.resize import resize_nearest

                sil_masks = resize_nearest(
                    (jnp.asarray(ann.target_masks) > 0).astype(jnp.float32),
                    SIL_RES, SIL_RES,
                ).reshape(f_frames, -1)
            out = P.prior_scores_batched(
                dino_params, dino_cfg, mesh_arrays.verts, mesh_arrays.faces,
                mesh_arrays.face_uvs, mesh_arrays.texture, view_rots, gt_feats,
                cos_masks, prior_cfg, window,
                host_batch=int(pc.get("host_batch", 1000)),
                view_mesh=view_mesh,
                with_sil=with_sil, sil_masks=sil_masks,
            )
        scores, sil_scores = out if with_sil else (out, None)
        jax.block_until_ready(scores)

    # ---- K_rois + refine config ----
    sq = jnp.asarray(ann.square_xyxy)
    K_rois = cam.get_K_crop_resize(
        jnp.broadcast_to(jnp.asarray(K_full), (f_frames, 3, 3)), sq, s
    )
    def _counted_refine_cap(rot_row, trans, K_rois_sel) -> tuple[int, int]:
        """(per-tile face cap, active-tile cap) for refinement, counted at
        the init poses over ALL frames with system.cap_headroom for pose
        motion (poses move during the 100 Adam steps; the in-loop overflow
        signal in tracker/refine.py remains the backstop).  Fixed caps
        corrupt edge-on poses silently; system.max_faces_per_tile forces
        an explicit face cap when set (active-tile compaction then runs
        dense)."""
        explicit = sysc.get("max_faces_per_tile")
        if explicit:
            return int(explicit), None
        from ..ops.rasterize import project_perspective
        from ..ops.rasterize_tiled import max_active_tiles_load, max_tile_load

        sig = float(sysc["sigma"])
        headroom = float(sysc.get("cap_headroom", 1.5))
        t_total = (-(-s // 16)) ** 2

        def one(R, t, K):
            vp = project_perspective(
                mesh_arrays.verts @ R + jnp.reshape(t, (1, 3)), K
            )
            margin = 6.0 * sig + 1.0  # match the fused kernel's binning
            return (
                max_tile_load(vp, mesh_arrays.faces, (s, s), margin=margin),
                max_active_tiles_load(vp, mesh_arrays.faces, (s, s), margin=margin),
            )

        loads, actives = jax.vmap(one)(rot_row, jnp.asarray(trans), K_rois_sel)
        worst = int(loads.max())
        cap = -(-int(worst * headroom) // 128) * 128
        cap = max(256, min(cap, int(mesh_arrays.faces.shape[0])))
        act = -(-int(int(actives.max()) * headroom) // 8) * 8
        act = max(8, min(act, t_total))
        return cap, act if act < t_total else None

    refine_cfg = RF.RefineConfig(
        num_iterations=int(sysc["init_num_iterations"]),
        lr=float(sysc["init_lr"]),
        crop_size=s,
        offscreen_weight=float(sysc["offscreen_weight"]),
        sigma=float(sysc["sigma"]),
        face_chunk=int(sysc["face_chunk"]),
        mode="fine",
    )
    targets = RF.FrameTargets(
        target_masks=jnp.asarray(ann.target_masks),
        gt_feats=gt_feats,
        K_rois=K_rois,
    )

    def autodepth(rot_row, bbox_xywh):
        pts = jnp.einsum("vj,bjk->bvk", mesh_arrays.verts, rot_row)
        return cam.tco_init_from_boxes_autodepth(
            jnp.asarray(bbox_xywh), pts,
            jnp.broadcast_to(jnp.asarray(K_full), (rot_row.shape[0], 3, 3)),
        )

    if bool(sysc.get("parallel_refine", True)):
        with prof.phase("gating+autodepth"):
            gate = S.gate_all_frames(scores, priors_row)
            rot_init = gate.rotation_init  # (F, 3, 3)
            oracle = sysc.get("oracle_init") or {}
            if oracle.get("enabled"):
                # ABLATION: replace the DINO-gated init with the GT-nearest
                # prior view (synthetic sequences only — isolates the view
                # selection from refine+joint robustness; VERDICT r3 #3).
                gt = np.load(oracle["gt_poses"])
                gt_row = jnp.asarray(gt["R"]).swapaxes(-1, -2)  # column->row
                ang = G.rotation_angle_difference(
                    priors_row[None, :], gt_row[:, None]
                )  # (F, N) degrees
                oracle_idx = jnp.argmin(ang, axis=1)
                rot_init = priors_row[oracle_idx]
                gate = gate._replace(selected_idx=oracle_idx)
                print(
                    "[ablation] oracle init: GT-nearest prior view per frame"
                    f" (mean residual {float(ang.min(1).mean()):.1f} deg)",
                    flush=True,
                )
            if num_init > 1 and not (oracle.get("enabled")):
                hyp = S.build_hypotheses(
                    rot_init, gate.selected_idx, priors_row, num_init,
                    sil_scores=sil_scores,
                    include_flips=bool(hypc.get("flips", True)),
                    min_angle_deg=float(hypc.get("min_angle_deg", 30.0)),
                )
                flat_rot = hyp.rotations.reshape(-1, 3, 3)  # (F*K, 3, 3)
                flat_bbox = np.repeat(ann.bbox_xywh, num_init, axis=0)
                flat_trans = autodepth(flat_rot, flat_bbox)  # (F*K, 3)
                trans_hyp = flat_trans.reshape(f_frames, num_init, 3)
                jax.block_until_ready(trans_hyp)
                K_flat = jnp.repeat(K_rois, num_init, axis=0)
                cap, act_cap = _counted_refine_cap(flat_rot, flat_trans, K_flat)
                rot_init, trans_init = hyp.rotations[:, 0], trans_hyp[:, 0]
            else:
                hyp = None
                trans_init = autodepth(rot_init, ann.bbox_xywh)  # (F, 3)
                jax.block_until_ready(trans_init)
                cap, act_cap = _counted_refine_cap(rot_init, trans_init, K_rois)
            refine_cfg = dataclasses.replace(
                refine_cfg, max_faces_per_tile=cap, max_active_tiles=act_cap
            )
            joint_cap, joint_act = cap, act_cap
        with prof.phase("refine"):
            if hyp is not None:
                prop_rounds = int(hypc.get("propagate_rounds", 1))
                mres = RF.refine_poses_multihyp(
                    mesh_arrays, targets, hyp.rotations, trans_hyp,
                    dino_params, dino_cfg, refine_cfg,
                    tournament_iters=hypc.get("tournament_iters", 25),
                    select=str(hypc.get("select", "viterbi")),
                    smooth_weight=float(hypc.get("smooth_weight", 1.0 / 45.0)),
                    propagate_rounds=prop_rounds,
                )
                res = mres.result
                win = np.asarray(mres.winner)
                hyp_src = np.asarray(hyp.indices)
                n_non_gate = int((win != 0).sum())
                if prop_rounds > 0:
                    # After propagation the slots index the NEIGHBOUR-seeded
                    # set (0 = own previous winner), not the original
                    # hypothesis views — a source-view index is meaningless.
                    print(
                        f"[hypotheses] {num_init} inits/frame + {prop_rounds}"
                        f" propagation round(s); final winner slots "
                        f"{win.tolist()} (0=own winner, 1..=neighbour"
                        f" winners); {n_non_gate}/{len(win)} frames took a"
                        " neighbour's pose",
                        flush=True,
                    )
                    sel_idx = np.asarray(gate.selected_idx)
                else:
                    print(
                        f"[hypotheses] {num_init} inits/frame; winner slots "
                        f"{win.tolist()} (0=gate, src idx "
                        f"{hyp_src[np.arange(len(win)), win].tolist()}); "
                        f"{n_non_gate}/{len(win)} frames changed init",
                        flush=True,
                    )
                    sel_idx = hyp_src[np.arange(len(win)), win]
            else:
                res = RF.refine_poses(
                    mesh_arrays, targets, rot_init, trans_init, dino_params,
                    dino_cfg, refine_cfg,
                )
                sel_idx = np.asarray(gate.selected_idx)
            jax.block_until_ready(res.rot6d)
        rot6d, trans = res.rot6d, res.translations
        losses, ious = np.asarray(res.final_loss), np.asarray(res.final_iou)
    else:
        # Sequential parity mode: thread the REFINED rotation into the gate.
        if num_init > 1:
            print(
                "note: num_initializations > 1 is a parallel-pipeline feature;"
                " sequential parity mode refines the single gate pick"
                " (reference control flow)",
                flush=True,
            )
        state = S.initial_state()
        rot6d_list, trans_list, sel_list, loss_list, iou_list = [], [], [], [], []
        # ONE cap for all frames (max over the top-1 gate candidates):
        # per-frame caps would retrigger compilation for every distinct
        # value.  The gate may pick other candidates, so keep the counted
        # headroom; the in-loop overflow warning remains the backstop.
        top1 = priors_row[jnp.argmax(scores, axis=1)]
        t_all = autodepth(top1, ann.bbox_xywh)
        joint_cap, joint_act = _counted_refine_cap(top1, t_all, K_rois)
        refine_cfg = dataclasses.replace(
            refine_cfg, max_faces_per_tile=joint_cap, max_active_tiles=joint_act
        )
        for i in range(f_frames):
            state, gate = S.gate_frame(state, scores[i], priors_row)
            t0 = autodepth(gate.rotation_init[None], ann.bbox_xywh[i : i + 1])
            one_targets = RF.FrameTargets(
                target_masks=targets.target_masks[i : i + 1],
                gt_feats=targets.gt_feats[i : i + 1],
                K_rois=targets.K_rois[i : i + 1],
            )
            res = RF.refine_poses(
                mesh_arrays, one_targets, gate.rotation_init[None], t0,
                dino_params, dino_cfg, refine_cfg,
            )
            refined_row = G.rot6d_to_matrix(res.rot6d)[0]
            state = state._replace(prev_rotation=refined_row)
            rot6d_list.append(res.rot6d[0])
            trans_list.append(res.translations[0])
            sel_list.append(int(gate.selected_idx))
            loss_list.append(float(res.final_loss[0]))
            iou_list.append(float(res.final_iou[0]))
        rot6d = jnp.stack(rot6d_list)
        trans = jnp.stack(trans_list)
        sel_idx = np.asarray(sel_list, np.int32)
        losses, ious = np.asarray(loss_list), np.asarray(iou_list)

    init_rot_row = G.rot6d_to_matrix(rot6d)

    # ---- stage 2: joint temporal optimization ----
    joint_cfg = J.JointConfig(
        num_iterations=int(sysc["joint_num_iterations"]),
        lr=float(sysc["joint_lr"]),
        lw_sil_obj=float(sysc["loss"]["lw_sil_obj"]),
        lw_smooth_obj=float(sysc["loss"]["lw_smooth_obj"]),
        crop_size=s,
        sigma=float(sysc["sigma"]),
        face_chunk=int(sysc["face_chunk"]),
        max_faces_per_tile=joint_cap,
        max_active_tiles=joint_act,
    )
    with prof.phase("joint-opt"):
        jres = J.joint_optimize(
            mesh_arrays.verts, mesh_arrays.faces, init_rot_row, trans, K_rois,
            jnp.asarray(ann.target_masks), joint_cfg,
        )
        jax.block_until_ready(jres.rot6d)
    history = {k: np.asarray(v) for k, v in jres.history.items()}
    prof.summary()
    if board is not None:
        board.add_history(history)

    return TrackResult(
        rotations_row=np.asarray(G.rot6d_to_matrix(jres.rot6d)),
        translations=np.asarray(jres.translations),
        init_rotations_row=np.asarray(init_rot_row),
        init_translations=np.asarray(trans),
        selected_idx=sel_idx,
        K=K_full,
        K_rois=np.asarray(K_rois),
        history=history,
        refine_loss=losses,
        refine_iou=ious,
    )


def run_from_config(config: dict[str, Any], exps_root: str = "exps") -> TrackResult:
    """Full run.py-equivalent: load, track, save artifacts."""
    import time as _time

    t0 = _time.time()
    data_info = config["data_info"]
    # Fail loudly on miswired exports (channel order, soft masks, size
    # mismatches — io/ingest.py) BEFORE any device work; real sequences
    # come from external models (SAM-v2 etc.) the reference consumes blind.
    if bool(config.get("system", {}).get("validate_data", True)):
        from ..io.ingest import validate_or_raise

        validate_or_raise(data_info["dataroot"])
    seq = load_sequence(data_info["dataroot"])
    ann = process_frames(
        seq,
        crop_size=int(config["system"]["crop_size"]),
        bbox_expansion=float(config["system"]["bbox_expansion"]),
    )
    mesh = load_mesh(data_info["obj_path"], bool(data_info.get("normalize_mesh", True)))
    print(f"[profile] host preprocessing: {_time.time() - t0:.2f}s", flush=True)

    exp_dir = experiment_dir(config, exps_root)
    os.makedirs(exp_dir, exist_ok=True)
    if config.get("_config_path"):
        copy_config(exp_dir, config["_config_path"])
    board = Board(exp_dir)

    result = track_sequence(config, seq, ann, mesh, board=board)
    t0 = _time.time()
    result = maybe_vote_outliers(config, seq, ann, mesh, result, board)
    print(f"[profile] outlier-voting: {_time.time() - t0:.2f}s", flush=True)
    save_pose_npzs(
        exp_dir, seq.frame_ids, result.rotations_row, result.translations, result.K
    )
    board.close()
    return result


def maybe_vote_outliers(
    config: dict[str, Any],
    seq: SequenceData,
    ann: FrameAnnotations,
    mesh: MeshData,
    result: TrackResult,
    board: Board | None = None,
) -> TrackResult:
    """DKM-correspondence outlier voting + pose repair (BASELINE config #2).

    Runs when <dataroot>/correspondence_infos exists (README.md:43
    convention) and system.outlier_voting.enabled.
    """
    ov = config["system"].get("outlier_voting", {})
    if not ov.get("enabled", True):
        return result
    from ..neus.data import load_correspondences
    from . import outliers as OV

    corr = load_correspondences(config["data_info"]["dataroot"], seq.frame_ids)
    if corr is None:
        return result
    h, w = seq.obj_masks.shape[1:]
    report = OV.vote_outliers(
        jnp.asarray(mesh.verts), jnp.asarray(mesh.faces),
        result.rotations_row, result.translations[:, 0, :], result.K, corr,
        (h, w), threshold_px=float(ov.get("threshold_px", 8.0)),
    )
    print(
        f"outlier voting: scores px={np.round(report.frame_scores, 2)} "
        f"outliers={np.nonzero(report.outliers)[0].tolist()}"
    )
    if board is not None:
        for i, s in enumerate(report.frame_scores):
            if np.isfinite(s):
                board.add_scalar("outlier_score_px", float(s), i)
    if not report.outliers.any():
        return result
    R_fix, T_fix = OV.interpolate_poses(
        result.rotations_row, result.translations[:, 0, :], report.outliers
    )
    if ov.get("rejoint", True):
        sysc = config["system"]
        joint_cfg = J.JointConfig(
            num_iterations=max(int(sysc["joint_num_iterations"]) // 2, 1),
            lr=float(sysc["joint_lr"]),
            lw_sil_obj=float(sysc["loss"]["lw_sil_obj"]),
            lw_smooth_obj=float(sysc["loss"]["lw_smooth_obj"]),
            crop_size=int(sysc["crop_size"]),
            sigma=float(sysc["sigma"]),
            face_chunk=int(sysc["face_chunk"]),
        )
        jres = J.joint_optimize(
            jnp.asarray(mesh.verts), jnp.asarray(mesh.faces),
            jnp.asarray(R_fix), jnp.asarray(T_fix), jnp.asarray(result.K_rois),
            jnp.asarray(ann.target_masks), joint_cfg,
        )
        R_fix = np.asarray(G.rot6d_to_matrix(jres.rot6d))
        T_fix = np.asarray(jres.translations)[:, 0, :]
    return result._replace(
        rotations_row=np.asarray(R_fix),
        translations=np.asarray(T_fix).reshape(-1, 1, 3),
    )
