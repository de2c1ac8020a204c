"""rnr_tpu — a TPU-native neural rendering framework for free-viewpoint relighting.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
LansburyCH/relightable-nr (CVPR 2020 "A Neural Rendering Framework for
Free-Viewpoint Relighting", plus its bundled Deferred Neural Rendering
pipeline).  Nothing here is a port: the compute path is built for the TPU
MXU/VPU and the XLA compilation model (static shapes, fused elementwise,
scan/cond control flow), scaling happens through `jax.sharding` meshes and
collectives, and the hot rasterization kernels are Pallas.

Layout
------
- ``rnr_tpu.ops``      pure-function math core + rasterization kernels
- ``rnr_tpu.models``   flax modules (neural texture, U-Net, GCN, lighting, rays)
- ``rnr_tpu.data``     host-side datasets / OBJ / calibration IO
- ``rnr_tpu.parallel`` device meshes, shardings, distributed train steps
- ``rnr_tpu.train``    train state, losses, checkpointing
- ``rnr_tpu.drivers``  CLI entry points (precompute / stitch_lp / train / test)
"""

__version__ = "0.1.0"
