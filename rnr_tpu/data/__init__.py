"""Host-side IO: meshes, calibration, image datasets, light probes."""

from rnr_tpu.data.obj import load_obj, save_obj, Mesh
