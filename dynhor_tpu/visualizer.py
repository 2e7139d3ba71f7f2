"""Overlay visualization of tracked poses (reference: utils/visualizer.py).

The reference renders via pyrender+OSMesa (GL) with a pink wireframe-ish
material and three directional lights (visualizer.py:12-56).  Off the hot
path, so we simply reuse the JAX rasterizer with a flat-color Phong
material — no GL / native dependency at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ops import rasterize as rz
from .ops.shading import Lights, phong_shade

BASE_COLOR = (0.8, 0.46, 0.51)  # visualizer.py:33 baseColorFactor


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _render_overlay(v, f, K, h: int, w: int):
    vp = rz.project_perspective(v, K)
    frag = rz.rasterize(vp, f, (h, w), face_chunk=1024)
    vn = rz.compute_vertex_normals(v, f)
    lights = Lights(
        location=jnp.array([0.0, -1.0, 0.0]),
        ambient=jnp.array([0.45, 0.45, 0.45]),
        diffuse=jnp.array([0.55, 0.55, 0.55]),
        specular=jnp.array([0.05, 0.05, 0.05]),
    )
    tex = jnp.ones((2, 2, 3)) * jnp.asarray(BASE_COLOR)
    fuv = jnp.zeros((f.shape[0], 3, 2)) + 0.5
    return phong_shade(frag, f, v, vn, fuv, tex, lights)


class Visualizer:
    def __init__(self, img_shape: tuple[int, int]):
        self.img_shape = img_shape  # (H, W)

    def draw_mesh(
        self,
        input_image: np.ndarray,
        verts: np.ndarray,
        faces: np.ndarray,
        pred_camera: tuple[float, float, float, float],
        return_mask: bool = False,
    ):
        """Render ``verts`` (camera frame, OpenCV convention) over the image.

        Args:
          input_image: (H, W, 3) float in [0, 1].
          pred_camera: (fx, fy, cx, cy).
        """
        h, w = self.img_shape
        fx, fy, cx, cy = pred_camera
        K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], jnp.float32)
        v = jnp.asarray(verts, jnp.float32)
        f = jnp.asarray(faces, jnp.int32)
        rgba = np.asarray(_render_overlay(v, f, K, h, w))
        valid = rgba[:, :, 3:4] > 0
        out = np.where(valid, np.clip(rgba[:, :, :3], 0, 1), input_image)
        if return_mask:
            return out, valid
        return out
