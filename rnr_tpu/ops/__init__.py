"""Pure-function math core (XLA) and Pallas kernels.

Everything in this package is functional, shape-static and jit-friendly:
no Python-level data-dependent control flow, no host sync inside the
compute path.
"""

from rnr_tpu.ops.interpolate import (
    interpolate_bilinear,
    interpolate_bilinear_batch,
    resize_bilinear,
)
from rnr_tpu.ops.spherical import (
    spherical_mapping,
    spherical_mapping_batch,
    spherical_mapping_inv,
    cart2sph,
    sph2cart,
    sample_light_dir,
)
from rnr_tpu.ops.sh import (
    evaluate_sh_basis,
    fit_sh_coeff,
    reconstruct_sh,
    num_sh_basis,
)
from rnr_tpu.ops.projection import (
    projection,
    vertices_to_faces,
    vertex_attrs_to_faces,
    interp_vertex_attr,
)
from rnr_tpu.ops.cameras import (
    get_view_dir_map,
    get_reflect_dir,
    rt_from_pos_lookat,
    get_spiral,
    euler_to_rot,
)
from rnr_tpu.ops.tbn import face_tangents, get_tbn_map, get_tbn_map_perpixel
from rnr_tpu.ops.metrics import masked_err_metrics, psnr, ssim
from rnr_tpu.ops.rasterize import rasterize_face_index, pixel_attrs, RasterOutput
from rnr_tpu.ops.render_api import (
    Renderer,
    look,
    look_at,
    perspective,
    get_points_from_angles,
    lighting,
    sample_textures,
    rasterize_rgbad,
    rasterize_silhouettes,
    rasterize_depth,
    fill_back_faces,
)
from rnr_tpu.ops.edge_grad import silhouette, rasterize_opt
from rnr_tpu.ops.knn_pallas import stratified_knn
from rnr_tpu.ops.texture_pallas import mipmap_sample, gather_taps, scatter_taps
from rnr_tpu.ops.conv_pallas import conv3x3, down4, convt4
from rnr_tpu.ops.sh_pallas import sh_shade
