"""Multi-device tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.parallel import make_mesh, shard_rnr_batch, make_sharded_rnr_train_step
from rnr_tpu.models.rnr import RNRModel
from rnr_tpu.train import create_rnr_state, make_rnr_train_step
from rnr_tpu.train.steps import rnr_texture_flatten_init

from test_train import _tiny_rnr_cfg, _rnr_batch, _fib_sphere

KEY = jax.random.PRNGKey(0)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (1, 8)
    mesh2 = make_mesh(8, dp=2)
    assert mesh2.devices.shape == (2, 4)
    assert mesh2.axis_names == ("dp", "sp")


def test_sharded_batch_placement(rng):
    mesh = make_mesh(8, dp=2)
    batch = _rnr_batch(rng, s=32)
    batch = {k: (jnp.concatenate([v, v]) if v.ndim >= 3 and k != "gcn_pos" else v)
             for k, v in batch.items()}
    sb = shard_rnr_batch(batch, mesh)
    # gcn_pos replicated; image tensors sharded over (dp, sp)
    assert sb["gcn_pos"].sharding.is_fully_replicated
    spec = sb["uv_map"].sharding.spec
    assert spec[0] == "dp" and spec[1] == "sp"


def test_sharded_rnr_step_matches_single_device(rng):
    cfg = _tiny_rnr_cfg()
    model = RNRModel(cfg=cfg, l_dir=_fib_sphere(64))
    batch = _rnr_batch(rng, s=32)
    batch = {k: (jnp.concatenate([v, v]) if v.ndim >= 3 and k != "gcn_pos" else v)
             for k, v in batch.items()}
    state, tx = create_rnr_state(model, KEY, batch, cfg.train.lr)
    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)
        ),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)
        ),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }

    single = make_rnr_train_step(model, tx)
    s1, m1 = single(state, batch, statics, KEY)

    mesh = make_mesh(8, dp=2)
    sharded = make_sharded_rnr_train_step(model, tx, mesh)
    s2, m2 = sharded(state, batch, statics, KEY)

    # Same numerics on 8 virtual devices, up to reduction-order fp noise.
    # Adam divides tiny gradient differences by sqrt(v), so per-step param
    # deltas can reach the lr scale (2e-3); loss itself matches tightly.
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=float(cfg.train.lr)
        )
