import os
import textwrap

import numpy as np

from dynhor_tpu.utils.objio import load_obj

SHOES = os.path.join(
    os.path.dirname(__file__), "..", "assets", "shoes",
    "1229a2e6e97e_A_basketball_shoes_.obj",
)


def test_load_simple_obj(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        textwrap.dedent(
            """
            v 0 0 0
            v 1 0 0
            v 0 1 0
            v 1 1 0
            vt 0 0
            vt 1 0
            vt 0 1
            vt 1 1
            f 1/1 2/2 3/3
            f 2/2 4/4 3/3
            """
        )
    )
    mesh = load_obj(str(obj))
    assert mesh.verts.shape == (4, 3)
    assert mesh.faces.shape == (2, 3)
    np.testing.assert_array_equal(mesh.faces[0], [0, 1, 2])
    assert mesh.face_uvs.shape == (2, 3, 2)
    np.testing.assert_allclose(mesh.face_uvs[0, 1], [1.0, 0.0])


def test_quad_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    mesh = load_obj(str(obj))
    assert mesh.faces.shape == (2, 3)
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])


def test_load_shoes_demo_asset():
    # The in-repo demo mesh (2,502 verts / 5,000 faces — SURVEY.md §6).
    mesh = load_obj(SHOES)
    assert mesh.verts.shape == (2502, 3)
    assert mesh.faces.shape == (5000, 3)
    assert mesh.has_texture
    assert mesh.texture.ndim == 3 and mesh.texture.shape[2] == 3
    assert 0.0 <= mesh.texture.min() and mesh.texture.max() <= 1.0
    assert mesh.faces.min() == 0 and mesh.faces.max() == 2501
    assert mesh.face_uvs.min() >= -1e-6 and mesh.face_uvs.max() <= 1 + 1e-6
