"""Coverage-gradient validation: signs, finite differences, and an actual
silhouette-fitting optimization."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.edge_grad import rasterize_opt, silhouette


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


def _tex(color, f=1, ts=2):
    t = np.zeros((1, f, ts, ts, ts, 3), np.float32)
    t[..., :] = color
    return jnp.asarray(t)


class TestRasterizeOpt:
    """Textured rasterization with coverage gradients
    (parity target: neural_renderer/rasterize.py:103-158)."""

    def test_forward_matches_rgbad(self):
        from rnr_tpu.ops.render_api import rasterize_rgbad

        faces = jnp.asarray(_tri())
        tex = _tex((0.8, 0.3, 0.1))
        a = rasterize_opt(faces, tex, S, anti_aliasing=False,
                          near=0.0, far=100.0)
        b = rasterize_rgbad(faces, tex, S, anti_aliasing=False,
                            near=0.0, far=100.0)
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a["alpha"]), np.asarray(b["alpha"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a["depth"]), np.asarray(b["depth"]), atol=1e-5
        )

    def test_rgb_edge_term_finite_difference(self):
        # photometric loss on a colored triangle over black background:
        # coverage changes rgb, so vertex motion must carry gradient
        tex = _tex((1.0, 0.5, 0.25))
        rng = np.random.default_rng(0)
        wmap = jnp.asarray(
            rng.uniform(0.2, 1.0, (1, 3, S, S)).astype(np.float32)
        )

        def loss(f):
            out = rasterize_opt(f, tex, S, anti_aliasing=False,
                                near=0.0, far=100.0)
            return jnp.sum(out["rgb"] * wmap)

        faces0 = _tri()
        g = np.asarray(jax.grad(loss)(jnp.asarray(faces0)))[0, 0]
        assert np.abs(g[:, :2]).max() > 0  # edge term is alive
        eps = 2.0 * (2.0 / S)
        for vi, ax in [(0, 0), (0, 1), (1, 0), (2, 1)]:
            fp = faces0.copy()
            fp[0, 0, vi, ax] += eps
            fm = faces0.copy()
            fm[0, 0, vi, ax] -= eps
            fd = (float(loss(jnp.asarray(fp)))
                  - float(loss(jnp.asarray(fm)))) / (2 * eps)
            an = g[vi, ax]
            assert np.sign(fd) == np.sign(an), (vi, ax, fd, an)
            assert 0.2 < abs(an) / max(abs(fd), 1e-6) < 5.0, (vi, ax, fd, an)

    def test_texture_gradient_flows(self):
        faces = jnp.asarray(_tri())
        tex = _tex((0.5, 0.5, 0.5))

        def loss(t):
            out = rasterize_opt(faces, t, S, anti_aliasing=False,
                                near=0.0, far=100.0)
            return jnp.sum(out["rgb"])

        g = np.asarray(jax.grad(loss)(tex))
        assert np.abs(g).max() > 0

    def test_photometric_fitting_converges(self):
        # optimize vertex positions from a textured RGB loss only
        # (VERDICT r1 item 4's done-criterion)
        import optax

        tex = _tex((0.9, 0.6, 0.2))
        target_faces = jnp.asarray(_tri(cx=0.12, cy=-0.08, r=0.45))
        target = rasterize_opt(target_faces, tex, S, anti_aliasing=False,
                               near=0.0, far=100.0)["rgb"]

        faces = jnp.asarray(_tri(cx=0.0, cy=0.0, r=0.55))

        def loss_fn(f):
            rgb = rasterize_opt(f, tex, S, anti_aliasing=False,
                                near=0.0, far=100.0)["rgb"]
            return jnp.mean((rgb - target) ** 2)

        tx = optax.adam(5e-3)
        opt_state = tx.init(faces)
        losses = [float(loss_fn(faces))]
        step = jax.jit(jax.grad(loss_fn))
        for _ in range(150):
            g = step(faces)
            updates, opt_state = tx.update(g, opt_state)
            faces = optax.apply_updates(faces, updates)
            losses.append(float(loss_fn(faces)))
        assert min(losses) < losses[0] * 0.35, (losses[0], min(losses))


class TestPallasForward:
    """The differentiable path through the Pallas tile-binned forward
    (VERDICT r2 item 3): winner maps from rasterize_pallas, gradients from
    edge_gradients — exercised on CPU via interpret mode."""

    def test_silhouette_forward_parity(self):
        faces = jnp.asarray(_tri(cx=0.1, cy=-0.05, r=0.5))
        a = silhouette(faces, S, 0.0, 100.0, "pallas_interpret")
        b = silhouette(faces, S, 0.0, 100.0, "xla")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rasterize_opt_forward_parity(self):
        faces = jnp.asarray(_tri())
        tex = _tex((0.8, 0.3, 0.1))
        a = rasterize_opt(faces, tex, S, anti_aliasing=False,
                          near=0.0, far=100.0, backend="pallas_interpret")
        b = rasterize_opt(faces, tex, S, anti_aliasing=False,
                          near=0.0, far=100.0, backend="xla")
        for k in ("rgb", "alpha", "depth"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-6
            )

    def test_silhouette_fitting_converges_pallas(self):
        import optax

        target_faces = jnp.asarray(_tri(cx=0.12, cy=-0.08, r=0.45))
        target = silhouette(target_faces, S, 0.0, 100.0, "pallas_interpret")

        faces = jnp.asarray(_tri(cx=0.0, cy=0.0, r=0.55))

        def loss_fn(f):
            a = silhouette(f, S, 0.0, 100.0, "pallas_interpret")
            return jnp.mean((a - target) ** 2)

        tx = optax.adam(5e-3)
        opt_state = tx.init(faces)
        grad = jax.jit(jax.value_and_grad(loss_fn))
        l0, _ = grad(faces)
        losses = [float(l0)]
        for _ in range(150):
            l, g = grad(faces)
            updates, opt_state = tx.update(g, opt_state)
            faces = optax.apply_updates(faces, updates)
            losses.append(float(l))
        assert min(losses) < losses[0] * 0.35, (losses[0], min(losses))

    def test_photometric_fitting_converges_pallas(self):
        import optax

        tex = _tex((0.9, 0.6, 0.2))
        target_faces = jnp.asarray(_tri(cx=0.12, cy=-0.08, r=0.45))
        target = rasterize_opt(
            target_faces, tex, S, anti_aliasing=False, near=0.0, far=100.0,
            backend="pallas_interpret",
        )["rgb"]

        faces = jnp.asarray(_tri(cx=0.0, cy=0.0, r=0.55))

        def loss_fn(f):
            rgb = rasterize_opt(
                f, tex, S, anti_aliasing=False, near=0.0, far=100.0,
                backend="pallas_interpret",
            )["rgb"]
            return jnp.mean((rgb - target) ** 2)

        tx = optax.adam(5e-3)
        opt_state = tx.init(faces)
        grad = jax.jit(jax.value_and_grad(loss_fn))
        l0, _ = grad(faces)
        losses = [float(l0)]
        for _ in range(150):
            l, g = grad(faces)
            updates, opt_state = tx.update(g, opt_state)
            faces = optax.apply_updates(faces, updates)
            losses.append(float(l))
        assert min(losses) < losses[0] * 0.35, (losses[0], min(losses))


def test_sliver_triangle_has_vertical_gradient():
    """ADVICE r4: 1-px-thin faces must still produce coverage gradients.

    A sliver triangle thinner than a pixel row has no same-face vertical
    neighbors, so the same-face finite-difference barycentric rate is
    unreadable everywhere; the dist=1 sliver fallback must keep the
    vertical (thickness) gradient alive.  Without it, d(coverage)/dy was
    exactly zero for every vertex of such a face.
    """
    z = 2.0
    faces0 = np.asarray(
        [[[
            [-0.7, 0.01, z],
            [0.7, -0.04, z],
            [0.7, 0.06, z],
        ]]],
        np.float32,
    )

    def area(f):
        return jnp.sum(silhouette(jnp.asarray(f), S, 0.0, 100.0))

    cov = float(area(faces0))
    assert cov > 0, "sliver must cover at least a few pixel centers"

    g = np.asarray(jax.grad(area)(jnp.asarray(faces0)))[0, 0]
    # thickness gradient exists: widening the right end (v2 up, v1 down)
    # increases coverage
    assert g[2, 1] > 0, g
    assert g[1, 1] < 0, g

    # magnitude sanity vs a +-2px finite difference on v2.y (coverage is
    # a step function over a handful of pixels; same order of magnitude)
    eps = 2.0 * (2.0 / S)
    fp = faces0.copy(); fp[0, 0, 2, 1] += eps
    fm = faces0.copy(); fm[0, 0, 2, 1] -= eps
    fd = (float(area(fp)) - float(area(fm))) / (2 * eps)
    assert fd > 0
    assert 0.1 < g[2, 1] / fd < 10.0, (g[2, 1], fd)
