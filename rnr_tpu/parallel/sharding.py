"""Device meshes and SPMD shardings for multi-chip training/inference.

The reference's entire parallelism story is single-process DataParallel
plus a hand-placed two-GPU split with `.to(device)` copies
(train_dnr.py:174-177, train_rnr.py:144-150,490 — see SURVEY §2.7).  The
TPU-native replacement is one `jax.sharding.Mesh` with two logical axes:

  * ``dp`` — data parallel over views (the batch dimension),
  * ``sp`` — spatial parallel over image rows (the "sequence" axis of this
    model family: pixels).  XLA's SPMD partitioner inserts halo exchanges
    for the U-Net convolutions and turns the batch-stat norm reductions
    and loss/gradient reductions into ICI collectives automatically.

Parameters, mesh geometry and lighting are replicated; gradients
all-reduce over both axes as part of the jit-compiled step (overlapped
with backward by XLA's scheduler).  Multi-host extends the same mesh over
DCN via `jax.distributed.initialize` — no code change in the step.
"""

from __future__ import annotations

from typing import Any, Callable, TYPE_CHECKING

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if TYPE_CHECKING:  # import only for annotations — keeps models free to
    # import parallel.constraints without a package cycle
    from rnr_tpu.train.steps import TrainState


def make_mesh(
    n_devices: int | None = None,
    dp: int | None = None,
    axis_names: tuple[str, str] = ("dp", "sp"),
) -> Mesh:
    """Build a (dp, sp) mesh over the first n_devices devices.

    dp defaults to 1 (batch-1 workloads scale over image rows).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    dp = dp or 1
    sp = n // dp
    if dp * sp != n:
        raise ValueError(f"cannot factor {n} devices into dp={dp} x sp={sp}")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, spatial_axis: int | None = 1
                   ) -> NamedSharding:
    """Shard dim 0 over dp and (optionally) a spatial dim over sp."""
    spec: list[Any] = [None] * ndim
    spec[0] = "dp"
    if spatial_axis is not None and ndim > spatial_axis:
        spec[spatial_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_rnr_batch(batch: dict[str, jax.Array], mesh: Mesh) -> dict:
    """Place a G-buffer batch on the mesh: [N, H, ...] -> (dp, sp) sharded;
    mesh-level arrays (gcn_pos) replicated."""
    out = {}
    for k, v in batch.items():
        if k == "gcn_pos" or v.ndim < 3:
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
    return out




def _spmd_safe_model(model):
    """Force partitionable compute paths for mesh-sharded programs.

    pallas_call has no GSPMD partitioning rule, but the per-pixel kernels
    no longer need one: the SH shader and the texture gather/scatter run
    per row-shard through `jax.shard_map` (ops/shmap.py), with dcoeff /
    texture-gradient psums over the mesh — so `sh_kernel` keeps its
    configured backend under a mesh (VERDICT r3 item 4).  Only the U-Net
    conv kernels are still forced to the XLA formulation: their stencils
    need halo exchanges between row-shards, which the XLA conv gets from
    the SPMD partitioner for free and a shard_map'd Pallas conv would
    have to re-implement by hand (identical numerics either way —
    parity-pinned in tests).
    """
    import dataclasses

    cfg = model.cfg
    if cfg.render_net.conv_backend == "xla":
        return model
    new_cfg = dataclasses.replace(
        cfg,
        render_net=dataclasses.replace(
            cfg.render_net, conv_backend="xla"
        ),
    )
    return type(model)(
        cfg=new_cfg,
        l_dir=model.l_dir,
        init_lighting_coeff=model.init_lighting_coeff,
        texture_init=model.texture_init,
    )

def make_sharded_rnr_train_step(
    model,
    tx,
    mesh: Mesh,
    lighting_idx: int = 0,
) -> Callable:
    """RNR train step jit-compiled over the mesh.

    Params/opt-state replicated, batch sharded (dp, sp).  The returned
    callable has the same signature as the single-chip step
    (state, batch, statics, rng) -> (state, metrics).
    """
    from rnr_tpu.train.steps import make_rnr_train_step

    base_step = make_rnr_train_step(_spmd_safe_model(model), tx,
                                    lighting_idx)

    rep = replicated(mesh)

    def sharded_step(state: TrainState, batch, statics, rng):
        # jit propagates shardings from the inputs: replicated state +
        # (dp, sp)-sharded batch compile into one SPMD program whose
        # gradient reductions are ICI all-reduces.  The abstract-mesh
        # context activates the model-internal `constrain` calls
        # (parallel/constraints.py) during tracing, pinning U-Net
        # activations / GCN distance rows to the (dp, sp) layout.
        state = jax.device_put(state, rep)
        statics = jax.device_put(statics, rep)
        batch = shard_rnr_batch(batch, mesh)
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            return base_step(state, batch, statics, rng)

    # exposed for collective accounting (tools/scaling_bench.py lowers
    # the jitted base step on sharded args to read its HLO collectives)
    sharded_step.base_step = base_step
    return sharded_step


def make_sharded_dnr_train_step(cfg, mods, tx, mesh: Mesh) -> Callable:
    """DNR train step over the mesh — the TPU-native counterpart of the
    reference's `nn.DataParallel` wrapping (train_dnr.py:174-177): batch
    over dp, image rows over sp, params replicated."""
    from rnr_tpu.train.steps import make_dnr_train_step

    base_step = make_dnr_train_step(cfg, mods, tx)
    rep = replicated(mesh)

    def sharded_step(state, batch, rng):
        state = jax.device_put(state, rep)
        batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            return base_step(state, batch, rng)

    return sharded_step


def make_sharded_rnr_eval_step(model, mesh: Mesh, lighting_idx: int = 0
                               ) -> Callable:
    """Tile-sharded RNR inference over the mesh (BASELINE config 5:
    multi-host tile-sharded rendering of test sequences).  Image rows
    shard over sp, views over dp; the U-Net convolutions get their halo
    exchanges from the SPMD partitioner."""
    from rnr_tpu.train.steps import make_rnr_eval_step

    base = make_rnr_eval_step(_spmd_safe_model(model), lighting_idx)
    rep = replicated(mesh)

    def sharded_eval(state, batch, lp_override=None, relight=False,
                     v_feature=None, sh_override=None):
        state = jax.device_put(state, rep)
        batch = shard_rnr_batch(batch, mesh)
        if lp_override is not None:
            lp_override = jax.device_put(lp_override, rep)
        if v_feature is not None:
            v_feature = jax.device_put(v_feature, rep)
        if sh_override is not None:
            sh_override = jax.device_put(sh_override, rep)
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            return base(state, batch, lp_override=lp_override,
                        relight=relight, v_feature=v_feature,
                        sh_override=sh_override)

    return sharded_eval
