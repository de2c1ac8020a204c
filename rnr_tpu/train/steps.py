"""Jit-compiled train/eval steps for the RNR and DNR pipelines.

One Adam optimizer over every learnable part (reference train_rnr.py:376),
one XLA program per step.  States are plain pytrees so they shard
transparently under pjit (see rnr_tpu.parallel).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rnr_tpu.config import RNRConfig, DNRConfig
from rnr_tpu.models.rnr import RNRModel
from rnr_tpu.models.texture import TextureMapper
from rnr_tpu.models.unet import RenderingNet
from rnr_tpu.models.rays import rays_lt_chrom_loss
from rnr_tpu.train.losses import image_l1_loss, lighting_loss, albedo_prior_loss
from rnr_tpu.ops.metrics import masked_err_metrics


class TrainState(NamedTuple):
    """Pure-pytree train state (pjit-shardable)."""

    step: jax.Array
    params: Any
    constants: Any
    spectral: Any
    opt_state: Any


def _flatten_albedo(tm: TextureMapper, params, start_ch: int, end_ch: int):
    return tm.flatten_mipmap(params, start_ch, end_ch)


# ---------------------------------------------------------------------------
# RNR
# ---------------------------------------------------------------------------

def create_rnr_state(
    model: RNRModel,
    rng: jax.Array,
    sample_batch: dict[str, jax.Array],
    lr: float,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize model variables and optimizer."""
    p_rng, d_rng, g_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng, "gcn": g_rng},
        sample_batch,
        lighting_idx=0,
        train=True,
    )
    tx = optax.adam(lr)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=variables.get("constants", {}),
        spectral=variables.get("spectral", {}),
        opt_state=tx.init(params),
    )
    return state, tx


def rnr_texture_flatten_init(model: RNRModel, params) -> jax.Array:
    """relu(flattened initial albedo mipmap), the albedo-prior anchor
    (reference: network.py:58-60)."""
    tm = TextureMapper(
        texture_size=model.cfg.texture.texture_size,
        texture_num_ch=model.cfg.texture.texture_num_ch,
        mipmap_level=model.cfg.texture.mipmap_level,
    )
    flat = tm.flatten_mipmap(params["texture_mapper"], 0, 6)
    return jax.nn.relu(flat)


def make_rnr_loss_fn(model: RNRModel, lighting_idx: int = 0) -> Callable:
    """The RNR training loss (render L1 + lighting + chrom + albedo
    priors; reference train_rnr.py:519-611), factored out of the step so
    profiling can time value_and_grad in isolation from the optimizer
    update and metrics (tools/profile_components.py).

    loss_fn(params, state, batch, statics, rng) -> (loss, aux)
    """
    cfg = model.cfg
    tm = TextureMapper(
        texture_size=cfg.texture.texture_size,
        texture_num_ch=cfg.texture.texture_num_ch,
        mipmap_level=cfg.texture.mipmap_level,
    )

    def loss_fn(params, state: TrainState, batch, statics, rng):
        d_rng, g_rng = jax.random.split(rng)
        variables = {
            "params": params,
            "constants": state.constants,
            "spectral": state.spectral,
        }
        out, mutated = model.apply(
            variables,
            batch,
            lighting_idx=lighting_idx,
            train=True,
            mutable=["spectral"],
            rngs={"dropout": d_rng, "gcn": g_rng},
        )

        alpha = batch["alpha_map"]
        img_gt = batch["img_gt"]

        loss_rn = image_l1_loss(
            out["img"], img_gt, alpha, cfg.loss.border_crop
        )
        if cfg.lighting.fix_lighting:
            loss_light = jnp.zeros(())
        else:
            loss_light = lighting_loss(
                out["l_samples_est"],
                statics["l_samples_init"],
                statics["l_samples_mask"],
                cfg.loss.loss_lighting_weight,
                cfg.loss.loss_lighting_uncovered_weight,
            )
        loss_chrom, *_ = rays_lt_chrom_loss(out["rays_lt"], alpha, img_gt)
        loss_chrom = loss_chrom * cfg.loss.loss_rays_lt_chrom_weight

        albedo_flat = _flatten_albedo(tm, params["texture_mapper"], 0, 6)
        loss_alb_diff = albedo_prior_loss(
            albedo_flat[..., 0:3], statics["tex_flatten_init"][..., 0:3]
        )
        loss_alb_spec = albedo_prior_loss(
            albedo_flat[..., 3:6], statics["tex_flatten_init"][..., 3:6]
        )
        loss_alb = (loss_alb_diff + loss_alb_spec) * cfg.loss.loss_alb_weight

        loss = loss_rn + loss_light + loss_chrom + loss_alb
        aux = {
            "loss": loss,
            "loss_rn": loss_rn,
            "loss_lighting": loss_light,
            "loss_rays_lt_chrom": loss_chrom,
            "loss_alb": loss_alb,
            "img": out["img"],
            "spectral": mutated.get("spectral", state.spectral),
        }
        return loss, aux

    return loss_fn


def make_rnr_train_step(
    model: RNRModel,
    tx: optax.GradientTransformation,
    lighting_idx: int = 0,
) -> Callable:
    """Build the jitted RNR train step.

    step(state, batch, statics, rng) -> (state, metrics)

    `statics` carries the loss anchors:
      l_samples_init [S, C], l_samples_mask [S], tex_flatten_init [H, W, 6].
    """
    loss_fn = make_rnr_loss_fn(model, lighting_idx)

    # donate the incoming state: params/opt-state buffers are rewritten
    # every step, and without donation the update holds both copies
    # resident (~0.8 GB at canonical scale with Adam) — callers rebind
    # `state, metrics = step(state, ...)` so the old state is dead
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, statics, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, statics, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            constants=state.constants,
            spectral=aux["spectral"],
            opt_state=new_opt,
        )
        b = model.cfg.loss.border_crop
        alpha_c = batch["alpha_map"][:, b:-b, b:-b]
        metrics = masked_err_metrics(
            aux["img"][:, b:-b, b:-b] * alpha_c * 255.0,
            batch["img_gt"][:, b:-b, b:-b] * alpha_c * 255.0,
            alpha_c,
        )
        metrics.update(
            loss=aux["loss"],
            loss_rn=aux["loss_rn"],
            loss_lighting=aux["loss_lighting"],
            loss_rays_lt_chrom=aux["loss_rays_lt_chrom"],
            loss_alb=aux["loss_alb"],
            # rendered image for tensorboard grids — stays on device
            # unless the driver fetches it at a log boundary
            img=aux["img"],
        )
        return new_state, metrics

    return step


def _with_conv_backend(model: RNRModel, backend: str) -> RNRModel:
    import dataclasses

    cfg = model.cfg
    return type(model)(
        cfg=dataclasses.replace(
            cfg,
            render_net=dataclasses.replace(
                cfg.render_net, conv_backend=backend
            ),
        ),
        l_dir=model.l_dir,
        init_lighting_coeff=model.init_lighting_coeff,
        texture_init=model.texture_init,
    )


def make_rnr_eval_step(
    model: RNRModel,
    lighting_idx: int = 0,
    output_keys: tuple[str, ...] = ("img",),
) -> Callable:
    """Jitted inference step; optional lp_override enables relighting.

    `output_keys` prunes the returned dict (default: the rendered image
    only) so XLA can DCE / avoid materializing the big per-ray
    intermediates as program outputs; pass None for the full dict.

    conv_backend "auto" resolves per MODE: the Pallas 3x3 kernel wins
    the training A/B (fwd+bwd, tools/out/tpu_bench_r4.json: 153.5 vs
    157.5 ms) but loses inference (22.0 vs 25.9 fps — fwd-only graphs
    fuse pad/activation into XLA's conv emitter, which a Pallas custom
    call blocks), so eval swaps auto -> xla.  Param trees are identical
    across backends, so the same state serves both steps.  Forced
    values ("pallas", "pallas3", "xla") are honored as-is.
    """
    if model.cfg.render_net.conv_backend == "auto":
        model = _with_conv_backend(model, "xla")

    @partial(jax.jit, static_argnames=("relight",))
    def step(state: TrainState, batch, lp_override=None, relight: bool = False,
             v_feature=None, sh_override=None):
        variables = {
            "params": state.params,
            "constants": state.constants,
            "spectral": state.spectral,
        }
        out, _ = model.apply(
            variables,
            batch,
            lighting_idx=lighting_idx,
            lp_override=lp_override if relight else None,
            # novel-light SH projection (reference test_rnr.py:153-163):
            # relight through the fast direct-SH shading path
            sh_coeff_override=sh_override if relight else None,
            train=False,
            mutable=["spectral"],
            v_feature_override=v_feature,
        )
        if output_keys is not None:
            out = {k: out[k] for k in output_keys}
        return out

    return step


# ---------------------------------------------------------------------------
# DNR (the minimum end-to-end slice: texture + U-Net + L1)
# ---------------------------------------------------------------------------

class DNRModules(NamedTuple):
    texture_mapper: TextureMapper
    render_net: RenderingNet


def build_dnr_modules(cfg: DNRConfig, texture_init=None) -> DNRModules:
    """texture_init: optional [H, W, 3] array copied into the level-0
    texture's leading channels at param init (reference train_dnr.py
    --tex_fp / network.py TextureMapper texture_init, :51-54).  Only
    affects initialization — step builders don't need it."""
    return DNRModules(
        texture_mapper=TextureMapper(
            texture_size=cfg.texture.texture_size,
            texture_num_ch=cfg.texture.texture_num_ch,
            mipmap_level=cfg.texture.mipmap_level,
            apply_sh=cfg.texture.apply_sh,
            texture_init=texture_init,
        ),
        render_net=RenderingNet(
            nf0=cfg.render_net.nf0,
            in_channels=cfg.texture.texture_num_ch,
            out_channels=3,
            num_down_unet=cfg.render_net.num_down_unet,
            use_gcn=False,
            norm=cfg.render_net.norm,  # type: ignore[arg-type]
            pad_mode=cfg.render_net.pad_mode,
            conv_backend=cfg.render_net.conv_backend,
        ),
    )


def dnr_forward(mods: DNRModules, params, batch, rngs=None, train=True,
                sh_start_ch=3, img_max_val=2.0):
    neural_img = mods.texture_mapper.apply(
        {"params": params["texture_mapper"]},
        batch["uv_map"],
        batch.get("sh_basis_map"),
        sh_start_ch=sh_start_ch,
    )
    out = mods.render_net.apply(
        {"params": params["render_net"]},
        neural_img,
        None,
        train=train,
        rngs=rngs,
    )
    # map tanh output to [0, img_max_val] (train_dnr.py:252-254)
    return (out * 0.5 + 0.5) * img_max_val, neural_img


def create_dnr_state(
    cfg: DNRConfig, rng: jax.Array, sample_batch, lr: float,
    texture_init=None,
):
    mods = build_dnr_modules(cfg, texture_init=texture_init)
    p1, p2, d = jax.random.split(rng, 3)
    tex_vars = mods.texture_mapper.init(
        p1, sample_batch["uv_map"], sample_batch.get("sh_basis_map"),
        sh_start_ch=cfg.sh_start_ch,
    )
    neural = mods.texture_mapper.apply(
        tex_vars, sample_batch["uv_map"], sample_batch.get("sh_basis_map"),
        sh_start_ch=cfg.sh_start_ch,
    )
    net_vars = mods.render_net.init(
        {"params": p2, "dropout": d}, neural, None
    )
    params = {
        "texture_mapper": tex_vars["params"],
        "render_net": net_vars["params"],
    }
    tx = optax.adam(lr)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants={},
        spectral={},
        opt_state=tx.init(params),
    )
    return mods, state, tx


def make_dnr_train_step(cfg: DNRConfig, mods: DNRModules,
                        tx: optax.GradientTransformation) -> Callable:
    def loss_fn(params, batch, rng):
        out, _ = dnr_forward(
            mods, params, batch, rngs={"dropout": rng}, train=True,
            sh_start_ch=cfg.sh_start_ch,
        )
        loss = image_l1_loss(
            out, batch["img_gt"], batch["alpha_map"], cfg.loss.border_crop
        )
        return loss, out

    # donated for the same reason as the RNR step (old state is dead
    # after the caller rebinds)
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        b = cfg.loss.border_crop
        alpha_c = batch["alpha_map"][:, b:-b, b:-b]
        metrics = masked_err_metrics(
            out[:, b:-b, b:-b] * alpha_c * 255.0,
            batch["img_gt"][:, b:-b, b:-b] * alpha_c * 255.0,
            alpha_c,
        )
        metrics["loss"] = loss
        return new_state, metrics

    return step


def make_dnr_eval_step(cfg: DNRConfig, mods: DNRModules) -> Callable:
    @jax.jit
    def step(state: TrainState, batch):
        out, neural = dnr_forward(
            mods, state.params, batch, train=False, sh_start_ch=cfg.sh_start_ch
        )
        return out
    return step
