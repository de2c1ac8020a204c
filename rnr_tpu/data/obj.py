"""Wavefront OBJ IO (host-side NumPy).

Feature parity with the reference's fork of neural_renderer `load_obj`
(neural_renderer/load_obj.py:108-209): v/vn/vt records, faces with
v/vt/vn index triplets (including negative indices), fan triangulation of
polygons, optional unit-cube normalization.  Texture/MTL baking is handled
separately by the texture atlas utilities.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class MeshData:
    """Raw parsed OBJ arrays."""

    v: np.ndarray        # [V, 3] float32
    vn: np.ndarray       # [Vn, 3] float32 (possibly empty)
    vt: np.ndarray       # [Vt, 2] float32 (possibly empty)
    f_v_idx: np.ndarray  # [F, 3] int32
    f_vn_idx: np.ndarray  # [F, 3] int32 (possibly empty)
    f_vt_idx: np.ndarray  # [F, 3] int32 (possibly empty)
    # [F, ts, ts, ts, 3] float32 when load_obj(load_texture=True)
    textures: np.ndarray | None = None


def load_mtl(path: str) -> tuple[dict, dict]:
    """Parse Kd colors and map_Kd texture filenames from an MTL file.

    Mirrors the reference's load_mtl (neural_renderer/load_obj.py:13-29):
    returns ({material: [3] Kd color}, {material: texture filename}).
    """
    colors: dict[str, np.ndarray] = {}
    texture_filenames: dict[str, str] = {}
    material_name = ""
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "newmtl":
                material_name = parts[1]
            elif parts[0] == "map_Kd":
                texture_filenames[material_name] = parts[1]
            elif parts[0] == "Kd":
                colors[material_name] = np.array(
                    [float(x) for x in parts[1:4]], np.float32)
    return colors, texture_filenames


def _load_obj_textures(obj_path: str, mtl_path: str, texture_size: int,
                       texture_wrapping: str, use_bilinear: bool
                       ) -> np.ndarray:
    """Fill per-face texture volumes from an OBJ's materials.

    Host-side equivalent of the reference's load_textures
    (neural_renderer/load_obj.py:32-106): per-face UVs from vt records
    (missing vt index → slot 0, matching the reference's default), 0.5
    init, constant Kd fill per material, then map_Kd images sampled into
    each material's faces via the XLA atlas sampler
    (ops/texture_atlas.load_textures, the load_textures_cuda equivalent).
    """
    import cv2

    from rnr_tpu.ops import texture_atlas

    wrap_modes = {"REPEAT": texture_atlas.REPEAT,
                  "MIRRORED_REPEAT": texture_atlas.MIRRORED_REPEAT,
                  "CLAMP_TO_EDGE": texture_atlas.CLAMP_TO_EDGE,
                  "CLAMP_TO_BORDER": texture_atlas.CLAMP_TO_BORDER}
    wrap = wrap_modes[texture_wrapping]

    vts: list[list[float]] = []
    fvt: list[tuple[int, int, int]] = []
    material_names: list[str] = []
    material_name = ""
    with open(obj_path) as fh:
        lines = fh.readlines()
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "vt":
            vts.append([float(x) for x in parts[1:3]])
        elif parts[0] == "usemtl":
            material_name = parts[1]
        elif parts[0] == "f":
            corners = parts[1:]

            def vt_of(tok: str) -> int:
                t = tok.split("/")
                # reference quirk kept: a corner without a vt index maps
                # to 0 → after the -1 shift, the LAST vt record
                return int(t[1]) if len(t) > 1 and t[1] != "" and \
                    "//" not in tok else 0

            for k in range(1, len(corners) - 1):
                fvt.append((vt_of(corners[0]), vt_of(corners[k]),
                            vt_of(corners[k + 1])))
                material_names.append(material_name)
    vt = np.asarray(vts, np.float32).reshape(-1, 2)
    f_vt = np.asarray(fvt, np.int32) - 1          # [F, 3]
    faces_uv = vt[f_vt]                            # [F, 3, 2]
    nf = faces_uv.shape[0]
    ts = texture_size

    textures = np.full((nf, ts, ts, ts, 3), 0.5, np.float32)
    colors, texture_filenames = load_mtl(mtl_path)
    mat_arr = np.asarray(material_names)
    for name, color in colors.items():
        textures[mat_arr == name] = color[None, None, None, None, :]
    for name, fname in texture_filenames.items():
        fp = os.path.join(os.path.dirname(obj_path), fname)
        img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(fp)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.shape[2] == 4:
            img = img[:, :, :3]
        img = img[:, :, ::-1]  # BGR→RGB (cv2; reference uses skimage RGB)
        img = img.astype(np.float32) / 255.0
        img = img[::-1].copy()  # v measured from the bottom (reference)
        sel = mat_arr == name
        if not sel.any():
            continue
        sampled = np.asarray(texture_atlas.load_textures(
            img, faces_uv[sel], ts, wrap=wrap, use_bilinear=use_bilinear))
        textures[sel] = sampled
    return textures


def _resolve_index(tok: str, count: int) -> int:
    i = int(tok)
    return i - 1 if i > 0 else count + i


def load_obj(path: str, normalization: bool = False,
             use_native: bool = True, load_texture: bool = False,
             texture_size: int = 4, texture_wrapping: str = "REPEAT",
             use_bilinear: bool = True) -> MeshData:
    """Parse an OBJ file.

    Args:
      path: file path.
      normalization: if True, translate/scale vertices into the unit cube
        centered at the origin (reference: load_obj.py:197-201).
      use_native: prefer the C++ mmap parser (native/rnr_native.cpp) when
        the library is available; falls back to this Python parser.
      load_texture: if True, resolve the OBJ's `mtllib` and fill per-face
        texture volumes from its materials (reference load_obj.py:185-193
        → load_textures :32-106); result lands in MeshData.textures.
      texture_size / texture_wrapping / use_bilinear: texture-volume
        resolution and sampling knobs (reference load_obj.py:108).

    Returns MeshData with zero-based int32 face index triplets.
    """
    textures = None
    if load_texture:
        mtl_path = None
        with open(path) as fh:
            for line in fh:
                if line.startswith("mtllib"):
                    mtl_path = os.path.join(
                        os.path.dirname(path), line.split()[1])
        if mtl_path is None:
            raise RuntimeError(
                f"load_texture=True but {path} has no mtllib")
        textures = _load_obj_textures(
            path, mtl_path, texture_size, texture_wrapping, use_bilinear)
    if use_native:
        try:
            from rnr_tpu.data.native import parse_obj_native

            res = parse_obj_native(path)
        except Exception:
            res = None
        if res is not None:
            v, vt, vn, fv, fvt, fvn = res
            if normalization and len(v):
                vmin = v.min(0)
                vmax = v.max(0)
                v = v - (vmax + vmin) / 2.0
                v = v / np.abs(v).max()
            # python-parser parity: drop the triplet arrays entirely when
            # no face carried that attribute
            fvt = fvt if len(fvt) and (fvt >= 0).all() else np.zeros((0, 3), np.int32)
            fvn = fvn if len(fvn) and (fvn >= 0).all() else np.zeros((0, 3), np.int32)
            return MeshData(v=v, vn=vn, vt=vt, f_v_idx=fv,
                            f_vn_idx=fvn, f_vt_idx=fvt, textures=textures)
    vs: list[list[float]] = []
    vns: list[list[float]] = []
    vts: list[list[float]] = []
    fv: list[list[int]] = []
    fvt: list[list[int]] = []
    fvn: list[list[int]] = []

    with open(path, "r") as fh:
        for line in fh:
            if not line or line[0] == "#":
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                vs.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                vns.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                vts.append([float(x) for x in parts[1:3]])
            elif tag == "f":
                corners = parts[1:]
                # fan-triangulate polygons
                for k in range(1, len(corners) - 1):
                    tri = (corners[0], corners[k], corners[k + 1])
                    vi, vti, vni = [], [], []
                    for c in tri:
                        toks = c.split("/")
                        vi.append(_resolve_index(toks[0], len(vs)))
                        if len(toks) > 1 and toks[1] != "":
                            vti.append(_resolve_index(toks[1], len(vts)))
                        if len(toks) > 2 and toks[2] != "":
                            vni.append(_resolve_index(toks[2], len(vns)))
                    fv.append(vi)
                    if len(vti) == 3:
                        fvt.append(vti)
                    if len(vni) == 3:
                        fvn.append(vni)

    v = np.asarray(vs, np.float32).reshape(-1, 3)
    if normalization and len(v):
        # unit-cube normalization (reference: load_obj.py:197-201)
        vmin = v.min(0)
        vmax = v.max(0)
        v = v - (vmax + vmin) / 2.0
        v = v / np.abs(v).max()

    # vt/vn index triplets are only meaningful when every face carries
    # them; a mixed-format OBJ degrades to positions-only faces.
    if len(fvt) != len(fv):
        fvt = []
    if len(fvn) != len(fv):
        fvn = []
    return MeshData(
        v=v,
        vn=np.asarray(vns, np.float32).reshape(-1, 3),
        vt=np.asarray(vts, np.float32).reshape(-1, 2),
        f_v_idx=np.asarray(fv, np.int32).reshape(-1, 3),
        f_vn_idx=np.asarray(fvn, np.int32).reshape(-1, 3),
        f_vt_idx=np.asarray(fvt, np.int32).reshape(-1, 3),
        textures=textures,
    )


def save_obj(path: str, v: np.ndarray, f_v_idx: np.ndarray,
             vt: np.ndarray | None = None, vn: np.ndarray | None = None,
             f_vt_idx: np.ndarray | None = None,
             f_vn_idx: np.ndarray | None = None,
             textures: np.ndarray | None = None,
             texture_size_out: int = 16) -> None:
    """Write an OBJ file (counterpart of neural_renderer/save_obj.py).

    With `textures` ([F, ts, ts, ts, 3] per-face volumes), bakes them to a
    tiled 2D atlas png + companion .mtl and writes per-face atlas vt
    records, matching the reference's save_obj(textures=...) layout
    (save_obj.py:40-82): `f v/3i+1 v/3i+2 v/3i+3` triplets, the png saved
    row-flipped so OBJ's bottom-origin v convention reads it upright.
    """
    if textures is not None:
        import cv2

        from rnr_tpu.ops.texture_atlas import create_texture_image

        mtl_path = path[:-4] + ".mtl"
        png_path = path[:-4] + ".png"
        material_name = "material_1"
        image, atlas_uv = create_texture_image(
            np.asarray(textures, np.float32), texture_size_out)
        image = np.asarray(image)[::-1]  # bottom-origin v (reference :36)
        bgr = np.clip(image[:, :, ::-1] * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(png_path, bgr)
        with open(mtl_path, "w") as fh:
            fh.write(f"newmtl {material_name}\n")
            fh.write(f"map_Kd {os.path.basename(png_path)}\n")
        with open(path, "w") as fh:
            fh.write(f"# {os.path.basename(path)}\n#\n\n")
            fh.write(f"mtllib {os.path.basename(mtl_path)}\n\n")
            for p in v:
                fh.write(f"v {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")
            fh.write("\n")
            for p in np.asarray(atlas_uv).reshape(-1, 2):
                fh.write(f"vt {p[0]:.8f} {p[1]:.8f}\n")
            fh.write("\n")
            fh.write(f"usemtl {material_name}\n")
            for i, tri in enumerate(f_v_idx):
                fh.write(
                    f"f {tri[0] + 1}/{3 * i + 1} {tri[1] + 1}/{3 * i + 2} "
                    f"{tri[2] + 1}/{3 * i + 3}\n")
            fh.write("\n")
        return
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if vt is not None:
            for p in vt:
                fh.write(f"vt {p[0]} {p[1]}\n")
        if vn is not None:
            for p in vn:
                fh.write(f"vn {p[0]} {p[1]} {p[2]}\n")
        for i, tri in enumerate(f_v_idx):
            toks = []
            for k in range(3):
                s = str(tri[k] + 1)
                if f_vt_idx is not None or f_vn_idx is not None:
                    s += "/" + (str(f_vt_idx[i][k] + 1) if f_vt_idx is not None else "")
                    if f_vn_idx is not None:
                        s += "/" + str(f_vn_idx[i][k] + 1)
                toks.append(s)
            fh.write("f " + " ".join(toks) + "\n")


class Mesh:
    """Loaded mesh with optional global rigid transform.

    Mirrors the reference's `network.Mesh` (network.py:355-388): exposes
    original and transformed vertices/normals plus span/center statistics
    used for tolerance scaling.
    """

    def __init__(self, obj_path: str, global_RT: np.ndarray | None = None):
        data = load_obj(obj_path, normalization=False)
        self.data = data
        self.v_orig = data.v.copy()
        self.vn_orig = data.vn.copy()
        self.span_orig = data.v.max(0) - data.v.min(0)
        self.span_max_orig = float(self.span_orig.max())
        self.center_orig = data.v.mean(0)

        v, vn = data.v, data.vn
        if global_RT is not None:
            hom = np.concatenate([v, np.ones((v.shape[0], 1), v.dtype)], 1)
            v = (global_RT @ hom.T).T[:, :3].astype(np.float32)
            if len(vn):
                vn = (global_RT[:3, :3] @ vn.T).T
                vn = (vn / np.maximum(
                    np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
                ).astype(np.float32)
        self.v = v
        self.vn = vn
        self.vt = data.vt
        self.f_v_idx = data.f_v_idx
        self.f_vn_idx = data.f_vn_idx
        self.f_vt_idx = data.f_vt_idx
        self.num_vertex = v.shape[0]
        self.num_face = data.f_v_idx.shape[0]
        self.span = v.max(0) - v.min(0) if len(v) else np.zeros(3)
        self.span_max = float(self.span.max()) if len(v) else 0.0
        self.center = v.mean(0) if len(v) else np.zeros(3)
