"""Coverage-gradient validation: signs, finite differences, and an actual
silhouette-fitting optimization."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.edge_grad import silhouette


def _tri(cx=0.0, cy=0.0, r=0.5, z=2.0):
    return np.asarray(
        [[
            [cx - r, cy - r, z],
            [cx + r, cy - r, z],
            [cx, cy + r, z],
        ]],
        np.float32,
    )[None]


S = 32


def test_area_gradient_points_outward():
    faces = jnp.asarray(_tri())

    def area(f):
        return jnp.sum(silhouette(f, S, 0.0, 100.0))

    g = np.asarray(jax.grad(area)(faces))[0, 0]
    # enlarging the triangle increases coverage: bottom-left vertex should
    # want to move further left (-x) and down (-y in NDC)
    assert g[0, 0] < 0 and g[0, 1] < 0, g
    # bottom-right vertex: +x, -y
    assert g[1, 0] > 0 and g[1, 1] < 0, g
    # top vertex: +y
    assert g[2, 1] > 0, g
    assert (g[:, 2] == 0).all()


def test_gradient_magnitude_matches_finite_difference():
    faces0 = _tri()

    def area(f):
        return float(jnp.sum(silhouette(jnp.asarray(f), S, 0.0, 100.0)))

    g = np.asarray(
        jax.grad(lambda f: jnp.sum(silhouette(f, S, 0.0, 100.0)))(
            jnp.asarray(faces0)
        )
    )[0, 0]
    # finite differences over ~2 pixels in NDC
    eps = 2.0 * (2.0 / S)
    for vi, ax in [(0, 0), (1, 0), (2, 1)]:
        fp = faces0.copy()
        fp[0, 0, vi, ax] += eps
        fm = faces0.copy()
        fm[0, 0, vi, ax] -= eps
        fd = (area(fp) - area(fm)) / (2 * eps)
        an = g[vi, ax]
        # coverage is a step function; require matching sign and the same
        # order of magnitude
        assert np.sign(fd) == np.sign(an), (vi, ax, fd, an)
        assert 0.2 < abs(an) / max(abs(fd), 1e-6) < 5.0, (vi, ax, fd, an)


def test_silhouette_fitting_converges():
    # Hard-edge coverage gradients only flow from currently-covered
    # boundary pixels (true of the reference CUDA edge-walk too), so start
    # from a moderately offset triangle and fit the target silhouette.
    target_faces = jnp.asarray(_tri(cx=0.12, cy=-0.08, r=0.45))
    target = silhouette(target_faces, S, 0.0, 100.0)

    faces = jnp.asarray(_tri(cx=0.0, cy=0.0, r=0.55))

    def loss_fn(f):
        a = silhouette(f, S, 0.0, 100.0)
        return jnp.mean((a - target) ** 2)

    import optax

    tx = optax.adam(5e-3)
    opt_state = tx.init(faces)
    losses = [float(loss_fn(faces))]
    for _ in range(150):
        g = jax.grad(loss_fn)(faces)
        updates, opt_state = tx.update(g, opt_state)
        faces = optax.apply_updates(faces, updates)
        losses.append(float(loss_fn(faces)))
    assert min(losses) < losses[0] * 0.35, (losses[0], min(losses))
