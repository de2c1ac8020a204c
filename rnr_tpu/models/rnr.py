"""Flagship model: the full relightable neural renderer (RNR).

Composes the GCN light-transport prior, the mipmap neural texture, the
specular/diffuse ray fans, the deferred U-Net and the SH lighting model
into ONE flax module so the entire training step is a single jit-compiled
program with a single parameter tree — replacing the reference's two-GPU
module scatter with cross-device copies (train_rnr.py:144-150,490).

Forward data flow (reference train_rnr.py:483-539):
  v_feature = gcn(mesh_pos)                      # global [1, 512]
  neural_img = texture(uv_map, sh_basis_map)     # [N, H, W, 24]
  rays        = specular fan + diffuse fan       # [N, H, W, 3, 26]
  rays_lt     = unet([rays || normal || view || neural_img], v_feature)
  image       = ray_render(albedo, rays_uv, rays_lt, probe)
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from rnr_tpu.config import RNRConfig
from rnr_tpu.models.texture import TextureMapper
from rnr_tpu.models.unet import RenderingNet
from rnr_tpu.models.gcn import DenseDeepGCN, GCNConfig
from rnr_tpu.models.lighting import LightingSH
from rnr_tpu.models.rays import RaySampler, ray_render, ray_render_sh


class RNRModel(nn.Module):
    """End-to-end RNR forward model.

    Attributes:
      cfg: RNRConfig.
      l_dir: [3, num_sample] sphere sample directions (host array).
      init_lighting_coeff: optional [L, B, C] initial SH coefficients.
      texture_init: optional [H, W, 3] texture initialization.
    """

    cfg: RNRConfig
    l_dir: np.ndarray
    init_lighting_coeff: np.ndarray | None = None
    texture_init: np.ndarray | None = None

    def setup(self):
        c = self.cfg
        self.texture_mapper = TextureMapper(
            texture_size=c.texture.texture_size,
            texture_num_ch=c.texture.texture_num_ch,
            mipmap_level=c.texture.mipmap_level,
            apply_sh=c.texture.apply_sh,
            texture_init=self.texture_init,
            fix_texture=c.texture.fix_tex,
        )
        self.render_net = RenderingNet(
            nf0=c.render_net.nf0,
            in_channels=c.render_net_in_channels,
            out_channels=c.render_net_out_channels,
            num_down_unet=c.render_net.num_down_unet,
            out_channels_gcn=c.gcn.out_channels,
            use_gcn=c.use_gcn,
            norm=c.render_net.norm,  # type: ignore[arg-type]
            compute_dtype=c.render_net.compute_dtype,
            remat=c.render_net.remat,
            fuse_mode=c.render_net.fuse_mode,
            pad_mode=c.render_net.pad_mode,
            conv_backend=c.render_net.conv_backend,
        )
        if c.use_gcn:
            self.gcn = DenseDeepGCN(
                GCNConfig(
                    in_channels=c.gcn.in_channels,
                    n_filters=c.gcn.n_filters,
                    kernel_size=c.gcn.kernel_size,
                    n_blocks=c.gcn.n_blocks,
                    conv_type=c.gcn.conv_type,  # type: ignore[arg-type]
                    block_type=c.gcn.block_type,  # type: ignore[arg-type]
                    act_type=c.gcn.act_type,  # type: ignore[arg-type]
                    norm_type=c.gcn.norm_type,
                    use_bias=c.gcn.use_bias,
                    stochastic=c.gcn.stochastic,
                    epsilon=c.gcn.epsilon,
                    out_channels=c.gcn.out_channels,
                    knn_approx=c.gcn.knn_approx,
                    knn_recall=c.gcn.knn_recall,
                    graph_refresh_every=c.gcn.graph_refresh_every,
                    strat_min_dilation=c.gcn.strat_min_dilation,
                    stratum_width=c.gcn.stratum_width,
                    compute_dtype=c.gcn.compute_dtype,
                )
            )
        self.lighting = LightingSH(
            l_dir=self.l_dir,
            lmax=c.lighting.sh_lmax,
            num_lighting=c.lighting.num_lighting,
            num_channel=3,
            init_coeff=self.init_lighting_coeff,
            fix_params=c.lighting.fix_lighting,
            lp_recon_h=c.lighting.lp_recon_h,
            lp_recon_w=c.lighting.lp_recon_w,
        )
        self.ray_sampler = RaySampler(
            num_azi=c.rays.num_azi,
            num_polar=c.rays.num_polar,
            interval_polar=c.rays.interval_polar_specular,
            mode="reflect",
        )
        self.ray_sampler_diffuse = RaySampler(
            num_azi=c.rays.num_azi,
            num_polar=c.rays.num_polar,
            interval_polar=c.rays.interval_polar_diffuse,
            mode="diffuse",
        )

    def __call__(
        self,
        batch: dict[str, jax.Array],
        lighting_idx: int = 0,
        lp_override: jax.Array | None = None,
        train: bool = True,
        v_feature_override: jax.Array | None = None,
        sh_coeff_override: jax.Array | None = None,
    ) -> dict[str, Any]:
        """Full forward pass.

        Args:
          batch: dict with G-buffer maps (all NHWC):
            uv_map [N,H,W,2], sh_basis_map [N,H,W,9], normal_map [N,H,W,3],
            view_dir_map [N,H,W,3], view_dir_map_tangent [N,H,W,3],
            TBN_map [N,H,W,3,3], alpha_map [N,H,W,1],
            gcn_pos [V,3] (mesh vertices for the GCN).
          lighting_idx: which learned lighting to render under.
          lp_override: optional [1 or N, Hl, Wl, C] probe for relighting
            through the probe-gather path.
          sh_coeff_override: optional [B, C] SH coefficients for
            relighting through the fast direct-SH path — the analog of
            the reference's LightingLP.fit_sh -> LightingSH novel-light
            projection (test_rnr.py:153-163).  Takes precedence over
            lp_override.

        Returns dict with the rendered image and intermediates.
        """
        c = self.cfg
        n, h, w = batch["alpha_map"].shape[:3]

        v_feature = None
        if c.use_gcn:
            if v_feature_override is not None:
                # view-independent: inference reuses one precomputed
                # v_feature for every frame, like the reference restores it
                # from the checkpoint (test_rnr.py:168-182)
                v_feature = v_feature_override
            else:
                v_feature = self.gcn(batch["gcn_pos"], train=train)  # [1, 512]
            v_feature = jnp.broadcast_to(
                v_feature, (n, v_feature.shape[-1])
            )

        neural_img = self.texture_mapper(
            batch["uv_map"], batch["sh_basis_map"], sh_start_ch=6
        )
        albedo_diffuse = neural_img[..., 0:3]
        albedo_specular = neural_img[..., 3:6]

        # SH-direct shading never touches a probe, so the equirect ray
        # UVs (atan2/acos per pixel-ray) are skipped on that path
        use_sh = sh_coeff_override is not None or (
            lp_override is None and c.rays.direct_sh_shading
        )
        from rnr_tpu.parallel.constraints import constrain

        # the [N, H, W, 3, R] ray tensors are the largest activations in
        # the program — keep them row-sharded under a mesh, and store at
        # the configured ray dtype (bf16 halves their HBM traffic;
        # reductions over them accumulate in f32, see models/rays.py)
        rdt = jnp.dtype(c.rays.rays_dtype)
        fan_pivots = jnp.asarray(
            np.concatenate(
                [self.ray_sampler.pivots_dir.T,
                 self.ray_sampler_diffuse.pivots_dir.T], axis=0
            ).astype(np.float32)
        )
        rays_uv = None
        if use_sh and c.rays.fan_impl == "elementwise":
            from rnr_tpu.models.rays import build_fan_channels

            net_rays, rays_dir = build_fan_channels(
                batch["TBN_map"], batch["view_dir_map_tangent"],
                batch["alpha_map"], fan_pivots,
                self.ray_sampler.num_ray,
            )
            net_rays = constrain(net_rays.astype(rdt), "dp", "sp")
            rays_dir = constrain(rays_dir.astype(rdt), "dp", "sp")
            r_total = rays_dir.shape[-1]
        else:
            rays_dir_s, rays_uv_s, _ = self.ray_sampler(
                batch["TBN_map"], batch["view_dir_map_tangent"],
                batch["alpha_map"], with_uv=not use_sh,
            )
            rays_dir_d, rays_uv_d, _ = self.ray_sampler_diffuse(
                batch["TBN_map"], batch["view_dir_map_tangent"],
                batch["alpha_map"], with_uv=not use_sh,
            )
            rays_dir = constrain(
                jnp.concatenate([rays_dir_s, rays_dir_d], axis=-1)
                .astype(rdt),
                "dp", "sp",
            )
            if not use_sh:
                rays_uv = constrain(
                    jnp.concatenate([rays_uv_s, rays_uv_d], axis=-1),
                    "dp", "sp",
                )
            r_total = rays_dir.shape[-1]
            # [N,H,W,3,R] -> [N,H,W,R*3] with per-ray xyz grouping,
            # mirroring the reference's channel order
            # (train_rnr.py:530: rays as num_ray*3 leading channels).
            net_rays = jnp.swapaxes(rays_dir, -1, -2).reshape(
                n, h, w, r_total * 3
            )

        # all net_in components at the ray dtype: with rdt=bf16 this is
        # numerically identical to the U-Net's own input cast (its first
        # conv computes in bf16 either way) but halves the concat bytes
        net_in = jnp.concatenate(
            [
                net_rays,
                batch["normal_map"].astype(rdt),
                batch["view_dir_map"].astype(rdt),
                neural_img.astype(rdt),
            ],
            axis=-1,
        )
        lt = self.render_net(net_in, v_feature, train=train)
        rays_lt = lt.reshape(n, h, w, r_total, 3)
        rays_lt = constrain(
            ((rays_lt * 0.5 + 0.5) * c.rays.lt_max_val).astype(rdt),
            "dp", "sp",
        )

        if use_sh:
            sh_coeff = (
                sh_coeff_override
                if sh_coeff_override is not None
                else self.lighting.get_lighting_params(lighting_idx)
            )
            fan_inputs = None
            if c.rays.sh_fan_fuse:
                fan_inputs = (
                    batch["TBN_map"], batch["view_dir_map_tangent"],
                    fan_pivots,
                )
            rendered = ray_render_sh(
                albedo_specular,
                rays_dir,
                batch["alpha_map"],
                rays_lt,
                sh_coeff,
                c.lighting.sh_lmax,
                num_ray_diffuse=self.ray_sampler_diffuse.num_ray,
                albedo_diffuse=albedo_diffuse,
                separate_albedo=True,
                backend=c.rays.sh_kernel,
                fan_inputs=fan_inputs,
            )
        else:
            if lp_override is None:
                lp = self.lighting(lighting_idx, is_lp=True)
            else:
                lp = lp_override
            rendered = ray_render(
                albedo_specular,
                rays_uv,
                rays_lt,
                lp,
                num_ray_diffuse=self.ray_sampler_diffuse.num_ray,
                albedo_diffuse=albedo_diffuse,
                separate_albedo=True,
            )

        return {
            "img": rendered["out"],
            "l_samples_est": self.lighting(lighting_idx)[0],
            "rays_lt": rays_lt,
            "rays_uv": rays_uv,
            "rays_dir": rays_dir,
            "neural_img": neural_img,
            "albedo_specular": albedo_specular,
            "albedo_diffuse": albedo_diffuse,
            "v_feature": v_feature,
            "lp": rendered["lp"],
            "ltt_specular_map": rendered["ltt_specular_map"],
            "ltt_diffuse_map": rendered["ltt_diffuse_map"],
        }

    # Exposed for losses/diagnostics -------------------------------------

    def compute_v_feature(self, gcn_pos: jax.Array) -> jax.Array:
        """Run just the GCN (for caching across inference frames)."""
        if not self.cfg.use_gcn:
            raise ValueError("use_gcn is off")
        return self.gcn(gcn_pos, train=False)

    def lighting_samples(self, lighting_idx) -> jax.Array:
        """Reconstructed light samples at the sphere directions [S, C]."""
        return self.lighting(lighting_idx)[0]

    def reconstruct_lp(self, lighting_idx) -> jax.Array:
        return self.lighting(lighting_idx, is_lp=True)[0]
