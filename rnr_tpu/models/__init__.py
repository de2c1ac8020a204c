"""Flax model modules.

All image tensors are NHWC (TPU-native layout).  The reference's NCHW
tensors (PyTorch) map to these with a single transpose at the IO boundary.
"""

from rnr_tpu.models.texture import TextureMapper
from rnr_tpu.models.unet import RenderingNet, Unet
from rnr_tpu.models.gcn import DenseDeepGCN, GCNConfig
from rnr_tpu.models.lighting import LightingSH, LightingLP
from rnr_tpu.models.rays import RaySampler, RayRenderer, rays_lt_chrom_loss
