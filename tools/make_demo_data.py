#!/usr/bin/env python
"""Generate a synthetic demo sequence (SURVEY.md §4: the reference's demo
data lives on Google Drive and is not in-repo; a scripted trajectory of the
shoes mesh with rendered masks stands in as the golden fixture).

Writes <out>/rgb/NNNN.jpg, <out>/sam_seg/NNNN.png (G channel = object,
B channel = hand occluder — run.py:84-85 convention), and
<out>/gt_poses.npz with the ground-truth {R (o2c column), T} per frame for
trajectory-error evaluation.

    python tools/make_demo_data.py --out data/custom_shoes --frames 12
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="data/custom_shoes")
    parser.add_argument(
        "--obj", type=str, default="assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj"
    )
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--hand", action="store_true", default=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--correspondences", action="store_true", default=True,
        help="write DKM-style correspondence_infos npz for adjacent frames",
    )
    parser.add_argument(
        "--normals", action="store_true", default=True,
        help="write monocular_normal maps (from the rendered geometry)",
    )
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (JAX_PLATFORMS is preset by this"
        " image's sitecustomize, so the env var cannot override it; use"
        " this when another process holds the TPU)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from dynhor_tpu.ops import rasterize as rz
    from dynhor_tpu.ops.shading import default_lights, phong_shade
    from dynhor_tpu.utils import camera as cam
    from dynhor_tpu.utils import geometry as G
    from dynhor_tpu.utils.objio import load_obj

    mesh = load_obj(args.obj)
    verts = G.center_and_normalize_verts(jnp.asarray(mesh.verts))
    faces = jnp.asarray(mesh.faces)
    h, w = args.height, args.width
    K = cam.intrinsics_from_image(h, w)

    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "sam_seg"), exist_ok=True)
    if args.correspondences:
        os.makedirs(os.path.join(args.out, "correspondence_infos"), exist_ok=True)
    if args.normals:
        os.makedirs(os.path.join(args.out, "monocular_normal"), exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    R0 = G.random_rotations(key, 1)[0]  # row convention start pose

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def render_frame(R_row, t):
        verts_cam = verts @ R_row + t
        vn = rz.compute_vertex_normals(verts_cam, faces)
        vp = rz.project_perspective(verts_cam, K)
        frag = rz.rasterize(vp, faces, (h, w), face_chunk=1024)
        rgba = phong_shade(
            frag, faces, verts_cam, vn, jnp.asarray(mesh.face_uvs),
            jnp.asarray(mesh.texture), default_lights(),
        )
        # Camera-space normals, StableNormal-style OpenGL encoding.  Use
        # per-FACE geometric normals flipped toward the camera: vertex
        # normals cancel to ~0 on meshes with mixed winding (procedural
        # kettle), which poisoned the normal supervision.
        fv = verts_cam[faces]  # (F, 3, 3)
        fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        n2 = jnp.sum(fn * fn, axis=-1, keepdims=True)
        fn = jnp.where(n2 > 1e-20, fn / jnp.sqrt(jnp.where(n2 > 1e-20, n2, 1.0)), 0.0)
        center = fv.mean(axis=1)
        toward = -jnp.sign(jnp.sum(fn * center, axis=-1, keepdims=True))
        fn = fn * jnp.where(toward == 0, 1.0, toward)  # face the camera
        face_attr = jnp.broadcast_to(fn[:, None, :], (fn.shape[0], 3, 3))
        n_cam = rz.interpolate_face_attributes(frag, face_attr)
        n_gl = n_cam * jnp.array([1.0, -1.0, -1.0])
        normal_img = (n_gl + 1.0) / 2.0
        return rgba, normal_img

    Rs_out, Ts_out, vis_masks = [], [], []
    for i in range(args.frames):
        # Smooth trajectory: slow rotation about a fixed axis + gentle drift.
        ang = 0.05 * i
        c, s = np.cos(ang), np.sin(ang)
        Rz = jnp.asarray(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32))
        cy, sy = np.cos(0.03 * i), np.sin(0.03 * i)
        Ry = jnp.asarray(np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32))
        R_row = R0 @ Rz @ Ry
        t = jnp.array([0.1 * np.sin(0.2 * i), 0.05 * np.cos(0.3 * i), 2.0 + 0.1 * np.sin(0.15 * i)], jnp.float32)

        rgba_j, normal_j = render_frame(R_row, t)
        rgba = np.asarray(rgba_j)
        obj_mask = rgba[:, :, 3] > 0.5
        rgb = np.clip(rgba[:, :, :3], 0, 1)
        # Grey background instead of white (more photo-like).
        rgb = np.where(obj_mask[:, :, None], rgb, 0.45)

        # Synthetic "hand": a disc occluding part of the object from below.
        hand_mask = np.zeros((h, w), bool)
        if args.hand:
            ys, xs = np.nonzero(obj_mask)
            if len(ys):
                cx = int(xs.mean())
                cy_ = int(ys.max())
                rr = max(8, int(0.25 * (ys.max() - ys.min())))
                yy, xx = np.mgrid[0:h, 0:w]
                hand_mask = (yy - cy_) ** 2 + (xx - cx) ** 2 < rr**2
                rgb = np.where(hand_mask[:, :, None], np.array([0.75, 0.55, 0.45]), rgb)
        # SAM convention: the hand occludes the object -> remove hand pixels
        # from the visible object mask.
        visible_obj = obj_mask & ~hand_mask

        seg = np.zeros((h, w, 3), np.uint8)
        seg[:, :, 1] = visible_obj.astype(np.uint8) * 255
        seg[:, :, 2] = hand_mask.astype(np.uint8) * 255

        fid = f"{i:04d}"
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(args.out, "rgb", fid + ".jpg"), quality=95
        )
        Image.fromarray(seg).save(os.path.join(args.out, "sam_seg", fid + ".png"))
        if args.normals:
            nimg = np.asarray(normal_j)
            nimg = np.where(obj_mask[:, :, None], nimg, 0.5)
            Image.fromarray((np.clip(nimg, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.out, "monocular_normal", fid + ".png")
            )
        Rs_out.append(np.asarray(R_row).T)  # o2c column convention (npz parity)
        Ts_out.append(np.asarray(t))
        vis_masks.append(visible_obj)
        print(f"frame {fid}: obj px {int(visible_obj.sum())}, hand px {int(hand_mask.sum())}")

    if args.correspondences:
        from dynhor_tpu.neus.extract import sample_surface
        from dynhor_tpu.utils.camera import batch_proj2d

        surf = sample_surface(np.asarray(verts), np.asarray(mesh.faces), 400, seed=1)
        for i in range(args.frames - 1):
            Ra, Ta = Rs_out[i].T, Ts_out[i]  # back to row convention
            Rb, Tb = Rs_out[i + 1].T, Ts_out[i + 1]
            pa = surf @ Ra + Ta
            pb = surf @ Rb + Tb
            ua = np.asarray(batch_proj2d(jnp.asarray(pa)[None], jnp.asarray(K)[None]))[0]
            ub = np.asarray(batch_proj2d(jnp.asarray(pb)[None], jnp.asarray(K)[None]))[0]
            ok = (
                (ua[:, 0] >= 1) & (ua[:, 0] < w - 1) & (ua[:, 1] >= 1) & (ua[:, 1] < h - 1)
                & (ub[:, 0] >= 1) & (ub[:, 0] < w - 1) & (ub[:, 1] >= 1) & (ub[:, 1] < h - 1)
            )
            # keep matches landing on the visible object in both frames
            ok &= vis_masks[i][ua[:, 1].astype(int).clip(0, h - 1), ua[:, 0].astype(int).clip(0, w - 1)]
            ok &= vis_masks[i + 1][ub[:, 1].astype(int).clip(0, h - 1), ub[:, 0].astype(int).clip(0, w - 1)]
            if ok.sum() < 8:
                continue
            np.savez(
                os.path.join(args.out, "correspondence_infos", f"pairs_{i:04d}_{i + 1:04d}.npz"),
                frame_i=f"{i:04d}", frame_j=f"{i + 1:04d}",
                xy_i=ua[ok].astype(np.float32), xy_j=ub[ok].astype(np.float32),
            )
        print(f"wrote correspondences for {args.frames - 1} adjacent pairs")

    np.savez(
        os.path.join(args.out, "gt_poses.npz"),
        R=np.stack(Rs_out),
        T=np.stack(Ts_out),
        K=np.asarray(K),
    )
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
