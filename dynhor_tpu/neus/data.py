"""Reconstruction-stage data loading (host-side).

Follows the reference data convention (README.md:27-44):
  <seq>/rgb/*.png|jpg           target images
  <seq>/sam_seg/*.png           SAM-v2 masks (G channel = object)
  <seq>/monocular_normal/*.png  StableNormal camera-space normals,
                                encoded (n + 1) / 2 in RGB (optional)
  <seq>/correspondence_infos/   DKM dense correspondences (optional):
                                our on-disk schema is pairs_*.npz with
                                {frame_i, frame_j, xy_i (M,2), xy_j (M,2)}
                                (frame indices into the sorted rgb list)

Poses come from the stage-1 npz artifacts (exps/<seq>/<exp>/obj_infos/,
run.py:171-179 schema: R is object->camera COLUMN convention).
"""
from __future__ import annotations

import glob as globlib
import os

import jax.numpy as jnp
import numpy as np

from .trainer import CorrData, ReconData


def _frame_paths(dataroot: str) -> list[str]:
    paths = sorted(globlib.glob(os.path.join(dataroot, "rgb", "*.jpg")))
    if not paths:
        paths = sorted(globlib.glob(os.path.join(dataroot, "rgb", "*.png")))
    if not paths:
        raise FileNotFoundError(f"no rgb frames under {dataroot}/rgb")
    return paths


def load_recon_data(
    dataroot: str, poses_dir: str, downscale: int = 1
) -> tuple[ReconData, list[str]]:
    """Load supervision + stage-1 poses.

    Args:
      poses_dir: directory of per-frame npz files ({R, T, K}); frames with
        no pose file are skipped (vis.py:44 tolerance mirrored).
      downscale: integer image downscale factor (intrinsics rescaled).

    Returns (ReconData, frame_ids).
    """
    from PIL import Image

    paths = _frame_paths(dataroot)
    images, masks, normals, Rs, Ts = [], [], [], [], []
    frame_ids = []
    K = None
    have_normals = os.path.isdir(os.path.join(dataroot, "monocular_normal"))
    for p in paths:
        fid = os.path.basename(p)[:-4]
        pose_path = os.path.join(poses_dir, fid + ".npz")
        if not os.path.exists(pose_path):
            continue
        pose = np.load(pose_path)
        img = Image.open(p).convert("RGB")
        if downscale > 1:
            img = img.resize((img.width // downscale, img.height // downscale), Image.BILINEAR)
        images.append(np.asarray(img, np.float32) / 255.0)
        seg = np.asarray(
            Image.open(os.path.join(dataroot, "sam_seg", fid + ".png")).resize(
                img.size, Image.NEAREST
            )
        )
        masks.append((seg[:, :, 1] == 255).astype(np.float32))
        if have_normals:
            npath = os.path.join(dataroot, "monocular_normal", fid + ".png")
            nimg = Image.open(npath).resize(img.size, Image.BILINEAR)
            n = np.asarray(nimg, np.float32)[:, :, :3] / 255.0 * 2.0 - 1.0
            normals.append(n)
        # npz R is object->camera COLUMN convention; row convention = R^T.
        Rs.append(pose["R"].T.astype(np.float32))
        Ts.append(pose["T"].astype(np.float32).reshape(3))
        if K is None:
            K = pose["K"].astype(np.float32)
            if downscale > 1:
                K = K.copy()
                K[:2] /= downscale
        frame_ids.append(fid)
    if not frame_ids:
        raise FileNotFoundError(f"no poses found under {poses_dir}")
    data = ReconData(
        images=jnp.asarray(np.stack(images)),
        masks=jnp.asarray(np.stack(masks)),
        normals=jnp.asarray(np.stack(normals)) if normals else None,
        R_rows=jnp.asarray(np.stack(Rs)),
        Ts=jnp.asarray(np.stack(Ts)),
        K=jnp.asarray(K),
    )
    return data, frame_ids


def load_correspondences(
    dataroot: str, frame_ids: list[str], downscale: int = 1
) -> CorrData | None:
    """Load DKM-style correspondences if present (see module docstring)."""
    corr_dir = os.path.join(dataroot, "correspondence_infos")
    if not os.path.isdir(corr_dir):
        return None
    id_to_idx = {fid: i for i, fid in enumerate(frame_ids)}
    fi, fj, xi, xj = [], [], [], []
    for path in sorted(globlib.glob(os.path.join(corr_dir, "*.npz"))):
        d = np.load(path, allow_pickle=True)
        def resolve(v) -> int | None:
            """Frame reference -> index: accepts a frame-id string or an
            integer index into the sorted rgb list (both documented)."""
            raw = v.item() if getattr(v, "ndim", 1) == 0 else v
            if isinstance(raw, (int,)) or (
                isinstance(raw, str) and raw.isdigit() and raw not in id_to_idx
            ):
                idx = int(raw)
                return idx if 0 <= idx < len(frame_ids) else None
            return id_to_idx.get(str(raw))

        ai = resolve(d["frame_i"])
        bi = resolve(d["frame_j"])
        if ai is None or bi is None:
            continue
        m = d["xy_i"].shape[0]
        fi.append(np.full((m,), ai, np.int32))
        fj.append(np.full((m,), bi, np.int32))
        xi.append(d["xy_i"].astype(np.float32) / downscale)
        xj.append(d["xy_j"].astype(np.float32) / downscale)
    if not fi:
        return None
    return CorrData(
        frame_i=jnp.asarray(np.concatenate(fi)),
        frame_j=jnp.asarray(np.concatenate(fj)),
        xy_i=jnp.asarray(np.concatenate(xi)),
        xy_j=jnp.asarray(np.concatenate(xj)),
    )
