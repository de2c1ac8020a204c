"""Numerical parity against the ACTUAL reference implementation (torch CPU).

These tests import the reference's own modules from /root/reference
(read-only) and compare outputs element-wise with this framework's ops —
the strongest form of the BASELINE "allclose to the PyTorch reference"
requirement that can run without CUDA.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- stub the reference's unavailable imports -----------------------------
for name in ("torchvision", "torchvision.utils"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
if "pytorch_msssim" not in sys.modules:
    m = types.ModuleType("pytorch_msssim")
    m.ssim = lambda *a, **k: torch.zeros(1)
    sys.modules["pytorch_msssim"] = m

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# misc.interpolate_bilinear
# --------------------------------------------------------------------------

def test_interpolate_bilinear_vs_reference(rng):
    import misc as ref_misc

    from rnr_tpu.ops import interpolate_bilinear

    data = rng.standard_normal((9, 13, 5)).astype(np.float32)
    x = rng.uniform(-3, 15, (4, 40)).astype(np.float32)
    y = rng.uniform(-3, 12, (4, 40)).astype(np.float32)
    want = ref_misc.interpolate_bilinear(
        torch.from_numpy(data), torch.from_numpy(x.copy()),
        torch.from_numpy(y.copy()),
    ).numpy()
    got = np.asarray(
        interpolate_bilinear(jnp.asarray(data), jnp.asarray(x), jnp.asarray(y))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


# --------------------------------------------------------------------------
# neural_renderer projection
# --------------------------------------------------------------------------

def test_projection_vs_reference(rng):
    sys.path.insert(0, REF + "/neural_renderer/neural_renderer")
    import projection as ref_proj

    from rnr_tpu.ops import projection

    n, v = 2, 50
    verts = rng.standard_normal((n, v, 3)).astype(np.float32)
    verts[..., 2] += 4.0
    K = np.tile(
        np.asarray([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], np.float32),
        (n, 1, 1),
    )
    R_, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    R = np.tile(R_.astype(np.float32), (n, 1, 1))
    t = rng.standard_normal((n, 1, 3)).astype(np.float32) * 0.1
    dist = rng.uniform(-0.05, 0.05, (n, 5)).astype(np.float32)
    offset = rng.uniform(-4, 4, (n, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, (n, 2)).astype(np.float32)

    want = ref_proj.projection(
        torch.from_numpy(verts.copy()), torch.from_numpy(K),
        torch.from_numpy(R), torch.from_numpy(t), torch.from_numpy(dist),
        128, torch.from_numpy(offset), torch.from_numpy(scale),
    ).numpy()
    got = np.asarray(
        projection(
            jnp.asarray(verts), jnp.asarray(K), jnp.asarray(R),
            jnp.asarray(t), jnp.asarray(dist), 128,
            jnp.asarray(offset), jnp.asarray(scale),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# metric.psnr
# --------------------------------------------------------------------------

def test_psnr_vs_reference(rng):
    import metric as ref_metric

    from rnr_tpu.ops.metrics import psnr

    a = rng.uniform(0, 255, (16, 16, 3))
    b = rng.uniform(0, 255, (16, 16, 3))
    mask = (rng.uniform(size=(16, 16, 3)) > 0.5).astype(np.float64)
    np.testing.assert_allclose(
        float(psnr(jnp.asarray(a), jnp.asarray(b))),
        ref_metric.psnr(a, b), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))),
        ref_metric.psnr(a, b, mask=mask), rtol=1e-5,
    )


# --------------------------------------------------------------------------
# U-Net forward with copied weights
# --------------------------------------------------------------------------

def _torch_convs(module):
    """All Conv2d/ConvTranspose2d/BatchNorm2d leaves in traversal order."""
    out = []
    for m in module.modules():
        if isinstance(
            m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d, torch.nn.BatchNorm2d)
        ):
            out.append(m)
    return out


def _flax_layers_in_order(params):
    """Flatten our Unet params into creation order (names are indexed)."""

    def block_items(p, names):
        items = []
        for name in names:
            if name in p:
                items.append((name, p[name]))
        return items

    order = []
    # in conv + norm
    order.append(params["Conv_0"])
    if "BatchActNorm_0" in params:
        order.append(params["BatchActNorm_0"])
    nd = 0
    while f"DownBlock_{nd}" in params:
        nd += 1
    # torch's modules() recursion is innermost-first: each skip block
    # registers (submodule, down, up), so leaves appear as
    # d_inner, u_inner, d_mid, u_mid, ..., d_outer, u_outer.
    # flax names: DownBlock_0 = outermost down, UpBlock_0 = innermost up.
    for depth in range(nd):
        dbp = params[f"DownBlock_{nd - 1 - depth}"]
        for name in ["Conv_0", "BatchActNorm_0", "Conv_1", "BatchActNorm_1"]:
            if name in dbp:
                order.append(dbp[name])
        ubp = params[f"UpBlock_{depth}"]
        for name in [
            "ConvTranspose_0", "BatchActNorm_0", "Conv_0", "BatchActNorm_1",
        ]:
            if name in ubp:
                order.append(ubp[name])
    order.append(params["Conv_1"])
    return order


def test_unet_forward_vs_reference(rng):
    from pytorch_prototyping.pytorch_prototyping import Unet as TorchUnet

    from rnr_tpu.models.unet import Unet

    nf0, nd, cin, cout = 4, 3, 5, 3
    maxc = 8 * nf0

    tnet = TorchUnet(
        in_channels=cin, out_channels=cout, nf0=nf0, num_down=nd,
        max_channels=maxc, use_dropout=False,
        outermost_linear=True, use_gcn=False,
        outermost_highway_mode="concat",
    )
    tnet.train()  # reference keeps BN in train mode everywhere

    jnet = Unet(
        in_channels=cin, out_channels=cout, nf0=nf0, num_down=nd,
        max_channels=maxc, use_dropout=False, outermost_linear=True,
        use_gcn=False, norm="batch", compute_dtype="float32",
    )
    x = rng.standard_normal((2, 32, 32, cin)).astype(np.float32)
    variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables["params"]

    tlayers = _torch_convs(tnet)
    florder = _flax_layers_in_order(params)
    assert len(tlayers) == len(florder), (
        f"layer count mismatch torch={len(tlayers)} flax={len(florder)}: "
        f"{[type(t).__name__ for t in tlayers]}"
    )

    # copy torch weights into the flax tree (in place via mutation of dicts)
    for tmod, fp in zip(tlayers, florder):
        if isinstance(tmod, torch.nn.BatchNorm2d):
            fp["scale"] = jnp.asarray(tmod.weight.detach().numpy())
            fp["bias"] = jnp.asarray(tmod.bias.detach().numpy())
        elif isinstance(tmod, torch.nn.ConvTranspose2d):
            # torch [I, O, kh, kw] -> flax [kh, kw, I, O] plus a spatial
            # flip (flax's default ConvTranspose is a fractionally-strided
            # conv, torch's is the conv gradient)
            w = tmod.weight.detach().numpy()
            fp["kernel"] = jnp.asarray(
                np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
            )
            if tmod.bias is not None:
                fp["bias"] = jnp.asarray(tmod.bias.detach().numpy())
        else:  # Conv2d [O, I, kh, kw] -> [kh, kw, I, O]
            w = tmod.weight.detach().numpy()
            fp["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            if tmod.bias is not None:
                fp["bias"] = jnp.asarray(tmod.bias.detach().numpy())

    with torch.no_grad():
        want = tnet(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), None
        ).numpy()
    got = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, atol=2e-4, rtol=1e-3)
