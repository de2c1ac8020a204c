"""Closed-form real spherical harmonics, evaluated on-device.

The reference computes SH basis values one coefficient at a time through the
CPU-only `pyshtools` package (reference: sph_harm.py:41-71, csphase=1,
normalization='ortho').  Here the same basis is produced in closed form with
stable ladder recurrences, fully vectorized in XLA, differentiable, and
usable inside jit — which also removes the reference's per-pixel CPU
bottleneck in G-buffer precomputation (reference: precompute.py:239).

Convention (matches pyshtools csphase=1 / 'ortho'):
  * orthonormal over the sphere: integral of Y_lm^2 dOmega = 1,
  * no Condon-Shortley phase,
  * real basis: m > 0 -> cos(m*phi) terms, m < 0 -> sin(|m|*phi) terms,
  * flattened ordering: (l, m) for l = 0..lmax, m = -l..l
    (index = l*l + l + m), matching the reference's fill order
    (sph_harm.py:62-70).

theta is the colatitude measured from +z, phi = atan2(y, x).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def num_sh_basis(lmax: int) -> int:
    return (lmax + 1) ** 2


def evaluate_sh_basis(lmax: int, directions: jax.Array) -> jax.Array:
    """Evaluate all real SH basis functions at unit directions.

    Args:
      lmax: maximum SH degree (static Python int).
      directions: [..., 3] unit vectors (x, y, z).

    Returns:
      [..., (lmax+1)^2] basis values, ordering (l, m=-l..l).
    """
    x = directions[..., 0]
    y = directions[..., 1]
    z = directions[..., 2]
    ct = jnp.clip(z, -1.0, 1.0)                      # cos(theta)
    st = jnp.sqrt(jnp.clip(1.0 - ct * ct, 0.0, None))  # sin(theta) >= 0

    # Q[m][l] holds the fully-normalized associated Legendre part
    # N_lm * P_lm(ct) (without Condon-Shortley phase).  Built with the
    # standard ladder: diagonal, off-diagonal, then three-term upward.
    inv_sqrt_4pi = 1.0 / math.sqrt(4.0 * math.pi)
    q: list[dict[int, jax.Array]] = [dict() for _ in range(lmax + 1)]
    q[0][0] = jnp.full_like(ct, inv_sqrt_4pi)
    for m in range(1, lmax + 1):
        q[m][m] = math.sqrt((2.0 * m + 1.0) / (2.0 * m)) * st * q[m - 1][m - 1]
    for m in range(0, lmax):
        q[m][m + 1] = math.sqrt(2.0 * m + 3.0) * ct * q[m][m]
    for m in range(0, lmax + 1):
        for l in range(m + 2, lmax + 1):
            a = math.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = math.sqrt(
                (((l - 1.0) ** 2 - m * m)) / (4.0 * (l - 1.0) ** 2 - 1.0)
            )
            q[m][l] = a * (ct * q[m][l - 1] - b * q[m][l - 2])

    # Azimuthal factors; sqrt(2) for |m| > 0 keeps orthonormality for the
    # real basis.  cos(m phi) / sin(m phi) come from the angle-addition
    # recurrence on (cos phi, sin phi) = (x, y) / hypot(x, y) — NO
    # transcendentals (the arctan2 + 2*lmax cos/sin of the naive form are
    # the dominant VPU cost of per-ray SH shading at lmax 10).
    # Normalizing by hypot(x, y) rather than the z-derived sin(theta)
    # keeps the recurrence invariant to (x, y) scale for slightly
    # unnormalized inputs, exactly like the arctan2 form (a z-derived
    # sin(theta) would amplify norm error as ((x^2+y^2)/(1-z^2))^(m/2)
    # up to m = lmax).  At the poles hypot = 0, but every m > 0 Legendre
    # term carries st^m = 0, so the azimuthal value there is irrelevant;
    # guard with (1, 0).
    sqrt2 = math.sqrt(2.0)
    # rsqrt of the CLAMPED squared norm: sqrt'(0)=inf would leak NaN into
    # any future backward through directions even though the value is
    # guarded (the round-2 chrom-loss trap, CLAUDE.md) — maximum() inside
    # the sqrt cuts the gradient chain at the pole instead.
    r2 = x * x + y * y
    inv_rxy = jnp.where(
        r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-60)), 0.0
    )
    c1 = jnp.where(r2 > 0, x * inv_rxy, 1.0)
    s1 = y * inv_rxy
    cos_m = [None] * (lmax + 1)
    sin_m = [None] * (lmax + 1)
    if lmax >= 1:
        cos_m[1], sin_m[1] = c1, s1
    for m in range(2, lmax + 1):
        cos_m[m] = cos_m[m - 1] * c1 - sin_m[m - 1] * s1
        sin_m[m] = sin_m[m - 1] * c1 + cos_m[m - 1] * s1

    out = []
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            if m == 0:
                out.append(q[0][l])
            elif m > 0:
                out.append(sqrt2 * q[m][l] * cos_m[m])
            else:
                out.append(sqrt2 * q[-m][l] * sin_m[-m])
    return jnp.stack(out, axis=-1)


def fit_sh_coeff(samples: jax.Array, sh_basis_val: jax.Array) -> jax.Array:
    """Monte-Carlo projection of sphere samples onto SH coefficients.

    Assumes the samples are uniformly distributed on the unit sphere, so the
    quadrature weight is 4*pi / num_sample (reference: sph_harm.py:74-88).

    Args:
      samples: [S, C] or [L, S, C] sampled function values.
      sh_basis_val: [S, B] basis values at the sample directions.

    Returns: [B, C] or [L, B, C] coefficients.
    """
    weight = 4.0 * jnp.pi / samples.shape[-2]
    return jnp.einsum("...sc,sb->...bc", samples, sh_basis_val) * weight


def reconstruct_sh(sh_coeff: jax.Array, sh_basis_val: jax.Array) -> jax.Array:
    """Evaluate an SH expansion at sample directions.

    Args:
      sh_coeff: [B, C] or [L, B, C].
      sh_basis_val: [S, B].

    Returns: [S, C] or [L, S, C]  (reference: sph_harm.py:91-102).
    """
    return jnp.einsum("sb,...bc->...sc", sh_basis_val, sh_coeff)
