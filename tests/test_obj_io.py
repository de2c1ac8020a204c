"""OBJ parser/writer roundtrip tests."""

import numpy as np

from rnr_tpu.data import load_obj, save_obj, Mesh


OBJ_TEXT = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.5
v 0.0 1.0 0.5
vt 0.0 0.0
vt 1.0 0.0
vt 1.0 1.0
vt 0.0 1.0
vn 0.0 0.0 1.0
f 1/1/1 2/2/1 3/3/1 4/4/1
"""


def test_load_obj_quads_and_triplets(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ_TEXT)
    m = load_obj(str(p))
    assert m.v.shape == (4, 3)
    assert m.vt.shape == (4, 2)
    assert m.vn.shape == (1, 3)
    # quad fan-triangulated into 2 faces
    np.testing.assert_array_equal(m.f_v_idx, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(m.f_vt_idx, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(m.f_vn_idx, [[0, 0, 0], [0, 0, 0]])


def test_load_obj_negative_indices(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    m = load_obj(str(p))
    np.testing.assert_array_equal(m.f_v_idx, [[0, 1, 2]])


def test_load_obj_normalization(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 2 2 2\nv 4 2 2\nv 4 4 4\nf 1 2 3\n")
    m = load_obj(str(p), normalization=True)
    assert np.abs(m.v).max() <= 1.0 + 1e-6
    np.testing.assert_allclose(m.v.max(0) + m.v.min(0), 0.0, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((5, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    vt = rng.uniform(0, 1, (5, 2)).astype(np.float32)
    p = tmp_path / "rt.obj"
    save_obj(str(p), v, f, vt=vt, f_vt_idx=f)
    m = load_obj(str(p))
    np.testing.assert_allclose(m.v, v, atol=1e-5)
    np.testing.assert_array_equal(m.f_v_idx, f)
    np.testing.assert_allclose(m.vt, vt, atol=1e-5)


def test_mesh_global_rt(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 1 0 0\nv 0 1 0\nv 0 0 1\nvn 1 0 0\nvn 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//2 3//3\n"
    )
    # 90-degree rotation about z plus translation
    RT = np.array(
        [[0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]], np.float64
    )
    m = Mesh(str(p), global_RT=RT)
    np.testing.assert_allclose(m.v[0], [1, 3, 3], atol=1e-5)
    # normals rotate without translation and stay unit
    np.testing.assert_allclose(m.vn[0], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(m.vn, axis=1), 1.0, atol=1e-5)
    assert m.span_max_orig > 0


def test_load_obj_mtl_texture_path(tmp_path):
    """load_obj(load_texture=True): Kd constant fill + map_Kd sampling

    (reference load_obj.py:13-106)."""
    import cv2

    # a solid red 8x8 texture image
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 2] = 255  # BGR red
    cv2.imwrite(str(tmp_path / "tex.png"), img)
    (tmp_path / "m.mtl").write_text(
        "newmtl blue\nKd 0.0 0.0 1.0\n"
        "newmtl texd\nmap_Kd tex.png\n"
    )
    (tmp_path / "m.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0.1 0.1\nvt 0.9 0.1\nvt 0.5 0.9\n"
        "usemtl blue\nf 1/1 2/2 3/3\n"
        "usemtl texd\nf 2/1 4/2 3/3\n"
    )
    m = load_obj(str(tmp_path / "m.obj"), load_texture=True,
                 texture_size=4)
    assert m.textures is not None and m.textures.shape == (2, 4, 4, 4, 3)
    # face 0: constant Kd blue
    np.testing.assert_allclose(
        m.textures[0], np.broadcast_to([0.0, 0.0, 1.0], (4, 4, 4, 3)),
        atol=1e-6)
    # face 1: sampled from the solid-red image
    np.testing.assert_allclose(
        m.textures[1], np.broadcast_to([1.0, 0.0, 0.0], (4, 4, 4, 3)),
        atol=2e-2)


def test_load_obj_no_mtllib_raises(tmp_path):
    (tmp_path / "m.obj").write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    try:
        load_obj(str(tmp_path / "m.obj"), load_texture=True)
    except RuntimeError:
        pass
    else:
        raise AssertionError("expected RuntimeError")


def test_save_obj_bakes_texture_atlas(tmp_path):
    """save_obj(textures=...) writes obj + mtl + png and atlas vt records

    (reference save_obj.py:40-82) that round-trip through
    load_obj(load_texture=True) to the original per-face colors."""
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    tex = np.zeros((2, 4, 4, 4, 3), np.float32)
    tex[0] = [1.0, 0.0, 0.0]
    tex[1] = [0.0, 1.0, 0.0]
    p = tmp_path / "baked.obj"
    save_obj(str(p), v, f, textures=tex)
    assert (tmp_path / "baked.mtl").exists()
    assert (tmp_path / "baked.png").exists()
    # CLAMP_TO_EDGE: REPEAT would wrap the atlas corner u=1.0 to 0.0
    # before interpolation (the reference CUDA kernel wraps corners the
    # same way, load_textures_cuda_kernel.cu:54-60)
    m = load_obj(str(p), load_texture=True, texture_size=4,
                 texture_wrapping="CLAMP_TO_EDGE")
    assert m.textures.shape == (2, 4, 4, 4, 3)
    # the (0,0,0) barycentric voxel has zero weights and samples atlas
    # pixel (0,0) — same artifact as the reference kernel
    # (load_textures_cuda_kernel.cu:44 `if (0 < dim0+dim1+dim2)`); skip it
    t = m.textures.reshape(2, -1, 3)[:, 1:, :]
    np.testing.assert_allclose(
        t[0], np.broadcast_to([1.0, 0.0, 0.0], t[0].shape), atol=0.05)
    np.testing.assert_allclose(
        t[1], np.broadcast_to([0.0, 1.0, 0.0], t[1].shape), atol=0.05)
