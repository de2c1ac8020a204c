"""Host-side IO: meshes, calibration, image datasets, light probes."""

from rnr_tpu.data.obj import load_obj, save_obj, Mesh
from rnr_tpu.data.dataset import (
    ViewDataset,
    LightProbeDataset,
    BatchLoader,
    collate_views,
    apply_sampling_pattern,
    glob_imgs,
    load_img,
)
