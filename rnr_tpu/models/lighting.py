"""Environment lighting models: spherical-harmonics and raw light probes.

Reference: network.py:534-699 (`LightingSH`, `LightingLP`).  SH basis
values at the sphere sample directions and on the reconstruction grid are
evaluated in closed form on device (no pyshtools) and cached in a
'constants' variable collection at init.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from rnr_tpu.ops.sh import evaluate_sh_basis, fit_sh_coeff, reconstruct_sh
from rnr_tpu.ops.spherical import spherical_mapping, spherical_mapping_inv
from rnr_tpu.ops.interpolate import interpolate_bilinear


def _recon_grid_dirs(h: int, w: int) -> jax.Array:
    """Unit directions of an equirect reconstruction grid ([H*W, 3]).

    Matches the reference's meshgrid of u in [0,1], v in [0,1]
    (network.py:576-579).
    """
    v = jnp.arange(h, dtype=jnp.float32) / (h - 1)
    u = jnp.arange(w, dtype=jnp.float32) / (w - 1)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=0)
    return spherical_mapping_inv(uv).T  # [H*W, 3]


class LightingSH(nn.Module):
    """Learnable SH lighting coefficients (network.py:534-627).

    Attributes:
      l_dir: [3, S] sphere sample directions (host array).
      lmax: max SH degree; num_basis = (lmax+1)^2.
      num_lighting: number of lighting conditions.
      num_channel: color channels.
      init_coeff: optional [L, B, C] initial coefficients.
      fix_params: stop gradients into the coefficients.
      lp_recon_h/w: light-probe reconstruction grid size.
    """

    l_dir: np.ndarray
    lmax: int = 10
    num_lighting: int = 1
    num_channel: int = 3
    init_coeff: np.ndarray | None = None
    fix_params: bool = False
    lp_recon_h: int = 100
    lp_recon_w: int = 200

    @property
    def num_basis(self) -> int:
        return (self.lmax + 1) ** 2

    def setup(self):
        dirs = jnp.asarray(np.asarray(self.l_dir).T)  # [S, 3]
        self._basis_val = self.variable(
            "constants", "basis_val",
            lambda: evaluate_sh_basis(self.lmax, dirs),
        )
        self._basis_val_recon = self.variable(
            "constants", "basis_val_recon",
            lambda: evaluate_sh_basis(
                self.lmax, _recon_grid_dirs(self.lp_recon_h, self.lp_recon_w)
            ),
        )

        def coeff_init(key):
            del key
            if self.init_coeff is not None:
                c = jnp.asarray(self.init_coeff, jnp.float32)
                if c.ndim == 2:
                    c = jnp.broadcast_to(
                        c[None], (self.num_lighting,) + c.shape
                    )
                return c
            return jnp.zeros(
                (self.num_lighting, self.num_basis, self.num_channel),
                jnp.float32,
            )

        self.coeff = self.param("coeff", coeff_init)

    def _coeff(self) -> jax.Array:
        c = self.coeff
        return jax.lax.stop_gradient(c) if self.fix_params else c

    def __call__(
        self,
        lighting_idx: int | jax.Array | None = None,
        coeff: jax.Array | None = None,
        is_lp: bool = False,
    ) -> jax.Array:
        """Light samples or reconstructed probes (network.py:584-611).

        Returns [1, S, C] / [1, L, S, C] samples, or
        [1, H, W, C] / [1, L, H, W, C] probes when is_lp.
        """
        if coeff is None:
            coeff = self._coeff()
            if lighting_idx is not None:
                coeff = coeff[lighting_idx]
        if is_lp:
            return self.reconstruct_lp(coeff)[None]
        return reconstruct_sh(coeff, self._basis_val.value)[None]

    def reconstruct_lp(self, coeff: jax.Array) -> jax.Array:
        """[B, C] or [L, B, C] coeff -> [H, W, C] or [L, H, W, C] probe."""
        flat = reconstruct_sh(coeff, self._basis_val_recon.value)
        shape = flat.shape[:-2] + (self.lp_recon_h, self.lp_recon_w, flat.shape[-1])
        return flat.reshape(shape)

    def get_lighting_params(self, lighting_idx) -> jax.Array:
        return self._coeff()[lighting_idx]

    @property
    def basis_val(self) -> jax.Array:
        return self._basis_val.value


def normalize_lighting_coeff(coeff: jax.Array, ref_idx: int) -> jax.Array:
    """Rescale every lighting's coeffs to the reference's Frobenius norm.

    Pure-function counterpart of `LightingSH.normalize_lighting`
    (network.py:616-620); apply to the checkpointed coeff parameter.
    """
    ref_norm = jnp.linalg.norm(coeff[ref_idx])
    norms = jnp.sqrt(jnp.sum(coeff * coeff, axis=(1, 2)))
    scale = ref_norm / jnp.maximum(norms, 1e-12)
    scale = scale.at[ref_idx].set(1.0)
    return coeff * scale[:, None, None]


class LightingLP(nn.Module):
    """Non-parametric per-sample light values (network.py:631-699).

    Attributes:
      l_dir: [3, S] sample directions.
      num_lighting: lighting count (overridden by lps when given).
      lps: optional [L, H, W, C] light-probe images used to initialize the
        learnable samples by bilinear lookup at the sample directions.
    """

    l_dir: np.ndarray
    num_lighting: int = 1
    num_channel: int = 3
    lps: np.ndarray | None = None
    fix_params: bool = False

    def setup(self):
        dirs = jnp.asarray(np.asarray(self.l_dir))
        uv = spherical_mapping(dirs)  # [2, S]
        n_light = (
            self.lps.shape[0] if self.lps is not None else self.num_lighting
        )

        def samples_init(key):
            del key
            if self.lps is None:
                return jnp.zeros(
                    (n_light, dirs.shape[1], self.num_channel), jnp.float32
                )
            out = []
            for i in range(n_light):
                lp = jnp.asarray(self.lps[i], jnp.float32)
                h, w = lp.shape[0], lp.shape[1]
                x = jnp.clip(uv[0] * w, None, w - 1)
                y = jnp.clip(uv[1] * h, None, h - 1)
                out.append(interpolate_bilinear(lp, x, y))
            return jnp.stack(out)

        self.l_samples = self.param("l_samples", samples_init)
        if self.lps is not None:
            self._lps = self.variable(
                "constants", "lps", lambda: jnp.asarray(self.lps, jnp.float32)
            )
        else:
            self._lps = None

    def __call__(self, lighting_idx=None, is_lp: bool = False) -> jax.Array:
        if is_lp:
            if self._lps is None:
                raise ValueError("no light probes stored")
            lps = self._lps.value
            return lps[None] if lighting_idx is None else lps[lighting_idx][None]
        s = self.l_samples
        if self.fix_params:
            s = jax.lax.stop_gradient(s)
        return s[None] if lighting_idx is None else s[lighting_idx][None]

    def fit_sh(self, lmax: int) -> jax.Array:
        """Project the light samples onto SH -> [L, B, C] coefficients."""
        dirs = jnp.asarray(np.asarray(self.l_dir).T)
        basis = evaluate_sh_basis(lmax, dirs)
        return fit_sh_coeff(self.l_samples, basis)
