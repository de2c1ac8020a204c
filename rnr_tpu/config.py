"""Configuration dataclasses — the knob surface of the framework.

Mirrors the reference's argparse flag sets (train_rnr.py:27-116,
train_dnr.py, precompute.py, test_rnr.py) as typed dataclasses.  Drivers
build these from CLI args and snapshot them to `params.json` in the log
dir (the counterpart of the reference's `params.txt`, which doubles as the
inference-time config source, test_rnr.py:53-79).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class TextureConfig:
    texture_size: int = 512
    texture_num_ch: int = 24
    mipmap_level: int = 4
    init_tex: bool = False
    fix_tex: bool = False
    apply_sh: bool = True


@dataclasses.dataclass(frozen=True)
class LightingConfig:
    sh_lmax: int = 10
    num_sample: int = 4096
    num_lighting: int = 1
    lighting_idx: int | None = None
    lighting_relight_idx: int | None = None
    fix_lighting: bool = False
    init_lighting: bool = True
    lp_recon_h: int = 256
    lp_recon_w: int = 512


@dataclasses.dataclass(frozen=True)
class RaysConfig:
    num_azi: int = 6
    num_polar: int = 2
    interval_polar_specular: float = 5.0
    interval_polar_diffuse: float = 10.0
    lt_max_val: float = 2.0
    # Shade rays directly from SH coefficients (basis(dir) . coeff) when
    # rendering under the learned SH lighting, instead of bilinear-sampling
    # a reconstructed 256x512 probe.  Mathematically exact (no equirect
    # discretization) and turns the probe-gradient scatter (285 ms/step on
    # v5e) into a matmul.  Explicit-probe relighting always uses the
    # sampling path.
    direct_sh_shading: bool = True
    # Storage dtype of the [N,H,W,3,R] / [N,H,W,R,C] ray tensors — the
    # largest activations of the step.  "bfloat16" halves their HBM
    # traffic; all reductions over them (SH shading sums, chrom loss)
    # accumulate in f32, and the SH basis itself is evaluated in f32
    # (the lmax-10 Legendre ladder is precision-sensitive).
    rays_dtype: str = "float32"
    # SH shading implementation: "auto" = fused Pallas kernel on TPU
    # (ops/sh_pallas.py, exact same ladder/convention as the XLA path,
    # rays_color never materializes); "xla" = checkpointed lax.map scan
    sh_kernel: str = "auto"
    # Fuse the ray-fan construction (reflect around pivots + TBN
    # transform + normalize, reference network.py:445-472) INTO the SH
    # shading kernel: the kernel reads TBN/view-dir (12 floats/pixel)
    # instead of the materialized [N,H,W,3,R] ray tensor (78), computes
    # the fan in f32 in VMEM, and skips both [N,R,3,H,W] transposes.
    # rays_dir is still built once in XLA for the U-Net input channels.
    sh_fan_fuse: bool = True
    # How the U-Net's ray input channels are built on the SH-direct
    # path: "elementwise" emits the [N,H,W,R*3] block directly from
    # lane-resident broadcasts (no per-pixel batched 3x3 einsum, no
    # swapaxes transpose — models/rays.py::build_fan_channels);
    # "einsum" restores the RaySampler composition.  Identical math
    # (parity-pinned to fp noise).
    fan_impl: str = "elementwise"


@dataclasses.dataclass(frozen=True)
class GCNTrainConfig:
    in_channels: int = 6
    kernel_size: int = 16
    block_type: str = "res"
    conv_type: str = "edge"
    # BasicConv knobs (reference train_rnr.py:88-90).  NOTE: the
    # reference CLI defaults to norm_type='batch'; rnr_tpu ships
    # norm_type=None (recorded benches/quality gates were measured
    # without the norm) — see PARITY.md "Known deltas".
    act_type: str = "relu"
    norm_type: str | None = None
    use_bias: bool = True
    n_filters: int = 64
    n_blocks: int = 20
    epsilon: float = 0.2
    stochastic: bool = True
    out_channels: int = 512
    knn_approx: bool = True
    knn_recall: float = 0.9
    graph_refresh_every: int = 1
    # dilation threshold for the Pallas stratified-kNN graphs
    # (models/gcn.py GCNConfig.strat_min_dilation; 0 = reference windowed
    # top-k for every block)
    strat_min_dilation: int = 3
    stratum_width: int = 16
    # EdgeConv compute dtype (graphs always built from f32 features)
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class RenderNetConfig:
    nf0: int = 64
    num_down_unet: int = 5
    norm: str = "batch"  # "batch" | "group" | "none"
    compute_dtype: str = "bfloat16"  # conv compute dtype; params stay f32
    # rematerialize U-Net blocks in backward (enables batch>=4 at 512^2):
    # False/"none" | True/"all" | "wide" (only the two widest levels +
    # fusion block — most of the memory, half the recompute)
    remat: bool | str = False
    # GCN fusion structure: "dense" (default) = constant-map conv
    # collapsed to a dense projection (models/unet.py::GcnFuseBlock,
    # ~3x fusion FLOP cut, identical function class — a conv over a
    # spatially-constant map only ever realizes its summed kernel);
    # "concat" = the reference's concat + 640-ch DownBlock structure
    fuse_mode: str = "dense"
    # U-Net conv padding: "reflect" = reference parity; "same" =
    # zero-padded convs (faster on TPU; differs only in the outermost
    # pixel ring, which the training loss crops)
    pad_mode: str = "reflect"
    # U-Net conv backend: "auto" = Pallas 3x3 implicit-GEMM + XLA 4x4
    # on TPU, pure XLA elsewhere (the round-4 measured best: 153.5 vs
    # 157.5 vs 163.2 ms full-step for pallas3/xla/pallas); "xla",
    # "pallas" (all kernels), "pallas3" force a choice.
    conv_backend: str = "auto"


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_lighting_weight: float = 1.0
    loss_lighting_uncovered_weight: float = 0.1
    loss_rays_lt_chrom_weight: float = 1.0
    loss_alb_weight: float = 1.0
    border_crop: int = 5  # pixels excluded from the image loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    batch_size: int = 1
    max_epoch: int = 2000
    max_iter: int | None = None
    sampling_pattern: str = "all"
    sampling_pattern_val: str = "all"
    val_freq: int = 1000
    log_freq: int = 100
    ckp_freq: int = 5000
    img_size: int = 512
    img_gamma: float = 1.0


@dataclasses.dataclass(frozen=True)
class RNRConfig:
    texture: TextureConfig = TextureConfig()
    lighting: LightingConfig = LightingConfig()
    rays: RaysConfig = RaysConfig()
    gcn: GCNTrainConfig = GCNTrainConfig()
    render_net: RenderNetConfig = RenderNetConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    use_gcn: bool = True

    @property
    def num_ray_specular(self) -> int:
        return self.rays.num_azi * self.rays.num_polar + 1

    @property
    def num_ray_diffuse(self) -> int:
        return self.rays.num_azi * self.rays.num_polar + 1

    @property
    def num_ray_total(self) -> int:
        return self.num_ray_specular + self.num_ray_diffuse

    @property
    def render_net_in_channels(self) -> int:
        # rays_dir (3 per ray) + normal(3) + view_dir(3) + neural texture
        return self.num_ray_total * 3 + 6 + self.texture.texture_num_ch

    @property
    def render_net_out_channels(self) -> int:
        return 3 * self.num_ray_total


@dataclasses.dataclass(frozen=True)
class DNRConfig:
    texture: TextureConfig = TextureConfig(texture_num_ch=30, apply_sh=True)
    render_net: RenderNetConfig = RenderNetConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    sh_start_ch: int = 3


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)


def _from_dict(cls, d: dict):
    kwargs = {}
    for field in dataclasses.fields(cls):
        if field.name not in d:
            continue
        v = d[field.name]
        if dataclasses.is_dataclass(field.type) and isinstance(v, dict):
            kwargs[field.name] = _from_dict(field.type, v)
        else:
            kwargs[field.name] = v
    return cls(**kwargs)


def load_config(cls, path: str):
    with open(path) as f:
        d = json.load(f)
    # resolve nested dataclass fields by name
    field_types = {
        "texture": TextureConfig,
        "lighting": LightingConfig,
        "rays": RaysConfig,
        "gcn": GCNTrainConfig,
        "render_net": RenderNetConfig,
        "loss": LossConfig,
        "train": TrainConfig,
    }
    kwargs = {}
    for field in dataclasses.fields(cls):
        if field.name not in d:
            continue
        v = d[field.name]
        if field.name in field_types and isinstance(v, dict):
            kwargs[field.name] = _from_dict(field_types[field.name], v)
        else:
            kwargs[field.name] = v
    return cls(**kwargs)
