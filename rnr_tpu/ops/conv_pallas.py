"""Pallas fused 3x3 stride-1 convolution (implicit GEMM) for the U-Net.

The reference U-Net's FLOPs are dominated by 3x3 stride-1 convolutions
(reference pytorch_prototyping.py:209-277: every DownBlock prep conv, the
GCN fusion convs, every UpBlock post conv, and the in/out layers).  XLA's
conv emitter reaches only ~25-30 TF/s bf16 on these NHWC shapes (round-2
probes, CLAUDE.md); this kernel reformulates the conv as an explicit
MXU matmul schedule:

  * rows are tiled; each grid cell DMAs a [TH+2, W+2, C] halo tile from
    HBM into VMEM (BlockSpec windows cannot overlap, so the halo copy is
    manual),
  * for each of the 9 taps (dy, dx), one dot contracts the WHOLE
    contiguous [TH*(W+2), C] slab against w[dy, dx]; the dx column
    shift is applied to the OUTPUT slice during accumulation.  Mosaic
    cannot codegen tpu.concatenate of lane-offset vectors (the im2col
    "concat 3 shifted slabs into [TH*W, 3C]" formulation dies with an
    INTERNAL layout error whenever C is not a multiple of 128, e.g. the
    108-channel U-Net input layer), while elementwise adds of shifted
    slices relayout fine.  The cost is K = C per dot instead of 3C
    (half MXU K-occupancy at C = 64) plus 2/W wasted columns,
  * the 9 dots accumulate into an f32 [TH, W, O] register tile,
  * an optional epilogue fuses bias + LeakyReLU before the single
    bf16 store — conv output never round-trips HBM in f32.

The custom VJP runs the SAME kernel for the input gradient (conv with the
spatially-rotated, transposed kernel — the classic dgrad identity) and a
dedicated accumulating kernel for the weight gradient (per-tile
[3C, TH*W] @ [TH*W, O] partials summed across the sequential TPU grid).

Zero padding ("same") and reflect padding are both supported by
pre-padding the input once in XLA; the kernel itself is padding-agnostic.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ru(v: int, m: int) -> int:
    """Round v up to a multiple of m."""
    return -(-v // m) * m


def _conv3x3_vmem_bytes(th: int, w: int, c: int, o: int,
                        x_item: int, out_item: int) -> int:
    """Modeled per-block VMEM working set of the 3x3 forward kernel.

    Counts the TILE-ALIGNED dims the kernel actually allocates: Mosaic
    requires every DMA'd extent of an ANY-space (HBM) operand to be
    aligned to the (8, 128) tiling — a logical-full slice of a
    physically padded memref still fails ("Slice shape along dimension 2
    must be aligned to tiling (8), but is 514", round-3 on-device) — so
    the impls pad W+2 to a multiple of 8 and C to a multiple of 128
    before the pallas_call, and the halo scratch holds the padded tile.

    The blocked output spec is pipeline DOUBLE-buffered at the REQUESTED
    out dtype — the round-4 on-device failure mode was the f32-out dgrad
    reuse of this kernel (16.61M > 16M scoped limit at TH=16, W=514,
    C=128, O=64) while the budget modeled a single bf16 output block.
    """
    wpa = _ru(w + 2, 8)
    ca = _ru(c, 128)
    xs = 2 * (th + 2) * wpa * ca * x_item     # double-buffered halo scratch
    acc = th * w * o * 4                      # f32 accumulator
    yfull = th * wpa * o * 4                  # per-tap dot result
    out = 2 * th * w * o * out_item           # double-buffered output block
    wgt = 3 * 3 * ca * o * x_item
    return xs + acc + yfull + out + wgt


def _down4_vmem_bytes(th: int, wo: int, c: int, o: int,
                      x_item: int, out_item: int) -> int:
    """Modeled per-block VMEM working set of the k4 s2 down kernel.

    4 single-buffered row/col-parity scratch planes [TH+1, WPA, CA] at
    the input dtype + the double-buffered output block [TH, WO, O] +
    per-tap f32 yfull/acc + weights [4, 4, CA, O].
    """
    wpa = _ru(wo + 1, 8)
    ca = _ru(c, 128)
    xs = 4 * (th + 1) * wpa * ca * x_item
    out = 2 * th * wo * o * out_item
    yfull = th * wpa * o * 4
    acc = th * wo * o * 4
    wgt = 4 * 4 * ca * o * x_item
    return xs + out + yfull + acc + wgt


def _convt4_vmem_bytes(th: int, wi: int, c: int, o: int,
                       x_item: int, out_item: int) -> int:
    """Modeled per-block VMEM working set of the k4 s2 transpose kernel.

    One scratch [TH+2, WPA, CA] + 4 double-buffered parity output blocks
    [TH, WI, O] + per-tap f32 yfull/acc + weights [4, 4, CA, O].
    """
    wpa = _ru(wi + 2, 8)
    ca = _ru(c, 128)
    xs = (th + 2) * wpa * ca * x_item
    outs = 4 * 2 * th * wi * o * out_item
    yfull = th * wpa * o * 4
    acc = th * wi * o * 4
    wgt = 4 * 4 * ca * o * x_item
    return xs + outs + yfull + acc + wgt


def _pick_th(w: int, c: int, o: int, x_item: int = 2, out_item: int = 2,
             vmem_budget=12 * 1024 * 1024) -> int:
    """Row-tile height: largest TH <= 64 fitting the VMEM budget.

    TH only strides leading dims (halo rows / output block rows), so it
    is not bound to the (8, 128) tiling — f32-activation or f32-output
    reuses of the kernels at large W need TH < 8 to fit scoped VMEM.
    """
    for th in (64, 32, 16, 8, 4, 2):
        if (_conv3x3_vmem_bytes(th, w, c, o, x_item, out_item)
                <= vmem_budget and th <= w * 8):
            return th
    return 2


def _halo_prefetch(xp_ref, xs, sem, th, rows):
    """Double-buffered halo loader for row-tiled kernels.

    xs is a 2-slot scratch [2, TH+extra, ...]; each grid cell (n, i)
    waits for its own tile (started by the previous cell) and prefetches
    tile i+1 of the same batch element.  The first tile of each batch
    element loads synchronously.  Returns the current tile's slot view.
    """
    i = pl.program_id(1)
    n = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    def copy_of(row_idx, s):
        return pltpu.make_async_copy(
            xp_ref.at[n, pl.ds(row_idx * th, rows)], xs.at[s], sem.at[s]
        )

    @pl.when(i == 0)
    def _():
        copy_of(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(1))
    def _():
        copy_of(i + 1, jax.lax.rem(i + 1, 2)).start()

    copy_of(i, slot).wait()
    return slot


def _conv_kernel(th, w, wpa, c, ca, o, n_rows, slope, fuse_act, out_dtype):
    """Forward kernel: out rows [i*TH, i*TH+TH) of a 3x3 s1 conv.

    wpa/ca are the DMA-tile-aligned W+2 and C extents (see _pick_th);
    the alignment padding is zeros with zero weights, so it never
    reaches the logical output slice.
    """

    def kernel(xp_ref, w_ref, b_ref, out_ref, xs, sem):
        slot = _halo_prefetch(xp_ref, xs, sem, th, th + 2)

        acc = jnp.zeros((th, w, o), jnp.float32)
        for dy in range(3):
            # contiguous slab: leading-dim slice only, no lane offsets
            xflat = xs[slot, dy:dy + th].reshape(th * wpa, ca)
            for dx in range(3):
                yfull = jnp.dot(
                    xflat, w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                ).reshape(th, wpa, o)
                acc = acc + yfull[:, dx:dx + w]
        y = acc + b_ref[0].astype(jnp.float32)[None, None, :]
        if fuse_act:
            y = jnp.where(y > 0, y, slope * y)
        out_ref[0] = y.astype(out_dtype)

    return kernel


@partial(
    jax.jit,
    static_argnames=("pad_mode", "fuse_act", "slope", "out_dtype",
                     "interpret"),
)
def _conv3x3_fwd_impl(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    pad_mode: str = "same",
    fuse_act: bool = False,
    slope: float = 0.2,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """x [N,H,W,C] bf16, w [3,3,C,O], b [O] -> [N,H,W,O]."""
    n, h, width, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="reflect" if pad_mode == "reflect" else "constant",
    )
    th = _pick_th(width, c, o, x.dtype.itemsize,
                  jnp.dtype(out_dtype).itemsize)
    if _conv3x3_vmem_bytes(th, width, c, o, x.dtype.itemsize,
                           jnp.dtype(out_dtype).itemsize) > 12 * 1024 * 1024:
        # even the minimal tile cannot fit scoped VMEM (f32 activations
        # at large W/C) — identical-semantics XLA fallback
        y = jax.lax.conv_general_dilated(
            xp, w.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b.astype(jnp.float32)[None, None, None, :]
        if fuse_act:
            y = jnp.where(y > 0, y, slope * y)
        return y.astype(out_dtype)
    grid_rows = pl.cdiv(h, th)
    # rows beyond H pad with zeros (outputs there are dropped)
    row_pad = grid_rows * th - h
    if row_pad:
        xp = jnp.pad(xp, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
    # Mosaic DMA alignment: every extent of the HBM operand's last two
    # dims must be a multiple of the (8, 128) tile — pad W+2 and C with
    # zeros (zero weights below make the extra channels inert; the extra
    # columns never reach the logical output slice).
    wpa = _ru(width + 2, 8)
    ca = _ru(c, 128)
    xp = jnp.pad(
        xp, ((0, 0), (0, 0), (0, wpa - (width + 2)), (0, ca - c))
    )

    # weights at the activation dtype: bf16 activations get bf16
    # multiplicands (f32 accumulation); f32 activations (e.g.
    # --unet_compute_dtype float32) keep f32 convs on this path too.
    # Kept [dy, dx, C, O]: each [C, O] tap plane is lane-aligned.
    wk = jnp.pad(w, ((0, 0), (0, 0), (0, ca - c), (0, 0))).astype(x.dtype)
    bk = b.astype(jnp.float32).reshape(1, o)

    kernel = _conv_kernel(
        th, width, wpa, c, ca, o, h, slope, fuse_act, jnp.dtype(out_dtype)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bias
        ],
        out_specs=pl.BlockSpec(
            (1, th, width, o), lambda nn, i: (nn, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, grid_rows * th, width, o), jnp.dtype(out_dtype)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wpa, ca), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wk, bk)
    return out[:, :h]


def _wgrad_kernel(th, w, wpa, c, ca, o, grid_rows, n_batch):
    """dW[dy, dx, C, O] accumulated across the sequential grid.

    dW[dy, dx] = sum_p x[p + (dy, dx) - 1] (x) g[p], one dot per tap.
    The shifted x window feeds the dot directly (Mosaic relayouts matmul
    operands; only concatenate of lane-offset vectors is unimplemented,
    see module docstring), and the 4-D [dy, dx, C, O] accumulator keeps
    every updated plane lane-aligned at offset 0.
    """

    def kernel(xp_ref, g_ref, dw_ref, xs, sem):
        i = pl.program_id(1)
        n = pl.program_id(0)
        slot = _halo_prefetch(xp_ref, xs, sem, th, th + 2)

        first = (i == 0) & (n == 0)

        @pl.when(first)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        g = g_ref[0].reshape(th * w, o)
        for dy in range(3):
            xd = xs[slot, dy:dy + th]          # [TH, WPA, CA]
            for dx in range(3):
                xsl = xd[:, dx:dx + w].reshape(th * w, ca)
                dw_ref[dy, dx] = dw_ref[dy, dx] + jax.lax.dot_general(
                    xsl, g,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    return kernel


@partial(jax.jit, static_argnames=("pad_mode", "interpret"))
def _conv3x3_wgrad_impl(x, g, pad_mode="same", interpret=False):
    """dW [3,3,C,O] f32 from x [N,H,W,C] and dOut [N,H,W,O]."""
    n, h, width, c = x.shape
    o = g.shape[-1]
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="reflect" if pad_mode == "reflect" else "constant",
    )
    # the wgrad block layout differs (blocked g input at x dtype + a tiny
    # revisited [3,3,CA,O] f32 accumulator instead of a full output
    # block); the forward model with a 4-byte "output" over-covers it.
    th = _pick_th(width, c, o, x.dtype.itemsize, 4)
    if _conv3x3_vmem_bytes(th, width, c, o, x.dtype.itemsize,
                           4) > 12 * 1024 * 1024:
        # minimal tile over scoped VMEM — XLA fallback (conv is linear
        # in w, so the vjp at zero weights is the exact wgrad).  All-f32
        # operands: conv_general_dilated requires matching dtypes and
        # the vjp feeds an f32 cotangent (round-4 1024^2 crash).
        _, vjp_w = jax.vjp(
            lambda w_: jax.lax.conv_general_dilated(
                xp.astype(jnp.float32), w_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            jnp.zeros((3, 3, c, o), jnp.float32),
        )
        (dw,) = vjp_w(g.astype(jnp.float32))
        return dw.astype(jnp.float32)
    grid_rows = pl.cdiv(h, th)
    row_pad = grid_rows * th - h
    if row_pad:
        xp = jnp.pad(xp, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
    # DMA tile alignment (see _pick_th): zero columns/channels contribute
    # zero to dW rows [c:ca), sliced off below.
    wpa = _ru(width + 2, 8)
    ca = _ru(c, 128)
    xp = jnp.pad(
        xp, ((0, 0), (0, 0), (0, wpa - (width + 2)), (0, ca - c))
    )

    kernel = _wgrad_kernel(th, width, wpa, c, ca, o, grid_rows, n)
    dw = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, th, width, o), lambda nn, i: (nn, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, ca, o), lambda nn, i: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, ca, o), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wpa, ca), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, g.astype(x.dtype))
    return dw[:, :, :c]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def conv3x3(x, w, b, pad_mode="same", fuse_act=False, slope=0.2,
            interpret=False):
    """Fused 3x3 stride-1 conv (+ optional bias + LeakyReLU), NHWC bf16.

    Args:
      x: [N, H, W, C] (bf16 recommended; any float works).
      w: [3, 3, C, O] weights (f32 master; cast to bf16 inside).
      b: [O] bias (pass zeros when the block is norm-followed — the
        reference disables conv bias under a norm,
        pytorch_prototyping.py:248).
      pad_mode: "same" (zero) or "reflect" — matches models/unet.py.
      fuse_act: apply LeakyReLU(slope) in the epilogue (valid only when
        no norm sits between conv and activation).

    Returns [N, H, W, O] in x.dtype.
    """
    return _conv3x3_fwd_impl(
        x, w, b, pad_mode=pad_mode, fuse_act=fuse_act, slope=slope,
        out_dtype=x.dtype, interpret=interpret,
    )


def _conv3x3_fwd(x, w, b, pad_mode, fuse_act, slope, interpret):
    out = _conv3x3_fwd_impl(
        x, w, b, pad_mode=pad_mode, fuse_act=fuse_act, slope=slope,
        out_dtype=x.dtype, interpret=interpret,
    )
    return out, (x, w, out if fuse_act else None)


def _conv3x3_bwd(pad_mode, fuse_act, slope, interpret, res, g):
    x, w, out = res
    g = g.astype(x.dtype)
    if fuse_act:
        # LeakyReLU is sign-preserving, so act'(pre) reads off the OUTPUT
        # sign — no pre-activation residual needed.
        g = jnp.where(out > 0, g, (slope * g.astype(jnp.float32)).astype(
            x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))

    # dgrad: conv3x3 of g with the rotated, io-transposed kernel (the
    # classic identity — exact for zero padding).
    w_rot = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # [3,3,O,C]
    zeros_c = jnp.zeros((w.shape[2],), jnp.float32)
    if pad_mode == "same":
        dx = _conv3x3_fwd_impl(
            g, w_rot, zeros_c, pad_mode="same", fuse_act=False,
            slope=slope, out_dtype=jnp.float32, interpret=interpret,
        )
    else:
        # reflect: d(conv ∘ reflect_pad) = reflect_pad^T ∘ d(conv).
        # The padded-input gradient dxp [H+2, W+2] is the FULL
        # correlation of g with w_rot — run the same kernel on g
        # zero-padded by one ring; then apply the exact adjoint of
        # reflect-pad: take the interior and fold the ring inward
        # (xp[0] = x[1] => dx[1] += dxp[0], etc.; corners compose).
        gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dxp = _conv3x3_fwd_impl(
            gp, w_rot, zeros_c, pad_mode="same", fuse_act=False,
            slope=slope, out_dtype=jnp.float32, interpret=interpret,
        )
        dx = dxp[:, 1:-1, 1:-1]
        dx = dx.at[:, 1, :].add(dxp[:, 0, 1:-1])
        dx = dx.at[:, -2, :].add(dxp[:, -1, 1:-1])
        dx = dx.at[:, :, 1].add(dxp[:, 1:-1, 0])
        dx = dx.at[:, :, -2].add(dxp[:, 1:-1, -1])
        dx = dx.at[:, 1, 1].add(dxp[:, 0, 0])
        dx = dx.at[:, 1, -2].add(dxp[:, 0, -1])
        dx = dx.at[:, -2, 1].add(dxp[:, -1, 0])
        dx = dx.at[:, -2, -2].add(dxp[:, -1, -1])
    return dx.astype(x.dtype), _conv3x3_wgrad_impl(
        x, g, pad_mode=pad_mode, interpret=interpret
    ).astype(w.dtype), db.astype(jnp.float32)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


# ---------------------------------------------------------------------------
# 4x4 stride-2 pair: down-conv and transpose-conv (mutual dgrad duals)
# ---------------------------------------------------------------------------
#
# The U-Net's remaining conv FLOPs are the encoder's 4x4 stride-2 downs
# and the decoder's 4x4 stride-2 transpose convs (reference
# pytorch_prototyping.py:258-264 and :124-206).  XLA lowers the transpose
# as an input-dilated conv (zeros inserted), wasting 3/4 of the MXU work;
# these kernels compute only the useful taps:
#
#   down:  out[i,j] = sum_{dy,dx in 0..3} xp[2i+dy, 2j+dx] w[dy,dx]
#          (xp = x zero-padded by 1 — SAME for k=4, s=2)
#   convT: out[2t+a, 2s+b] = sum over the 2x2 input neighborhood with the
#          parity-specific 2x2 sub-kernel (derived below, pinned by
#          parity tests against flax nn.ConvTranspose SAME)
#
# Column stride-2 access patterns are avoided by pre-splitting the padded
# input into even/odd column planes in XLA; in-kernel reads are then
# contiguous slices.  Row stride-2 access is a leading-dim stride (cheap).
# Weight gradients route through XLA's native wgrad (jax.vjp of the stock
# op w.r.t. w only): it is a single well-lowered conv, and fusing it
# would not change the activation-bandwidth story these kernels fix.


def _down4_kernel(th, wo, wpa, c, ca, o, out_dtype):
    """out rows [i*TH, i*TH+TH) of the k4 s2 down conv.

    Input planes E/O: [rows, WO+1, C] (column-parity split of xp), where
    output col j reads E[j], O[j], E[j+1], O[j+1] for dx = 0..3.
    Needs xp rows [2*i*TH, 2*i*TH + 2*TH + 2).
    """

    def kernel(ee_ref, oe_ref, eo_ref, oo_ref, w_ref, out_ref,
               s_ee, s_oe, s_eo, s_oo, sem):
        i = pl.program_id(1)
        n = pl.program_id(0)
        r0 = i * th
        scratch = ((s_ee, ee_ref), (s_oe, oe_ref),
                   (s_eo, eo_ref), (s_oo, oo_ref))
        dmas = []
        for k, (scr, ref) in enumerate(scratch):
            dma = pltpu.make_async_copy(
                ref.at[n, pl.ds(r0, th + 1)], scr, sem.at[k]
            )
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

        # plane[(row parity, col parity)]; tap (dy, dx) reads
        # xp[2i + dy, 2j + dx] = plane[dy%2, dx%2][i + dy//2, j + dx//2]
        # — every in-kernel read is a CONTIGUOUS leading-dim slice
        # (Mosaic has no strided vector load for 16-bit data; the old
        # interleaved-rows scratch needed es[dy::2]).
        planes = {(0, 0): s_ee, (1, 0): s_oe, (0, 1): s_eo, (1, 1): s_oo}
        acc = jnp.zeros((th, wo, o), jnp.float32)
        for dy in range(4):
            p_r, o_r = dy % 2, dy // 2
            for dx in range(4):
                p_c, o_c = dx % 2, dx // 2
                # full-slab dot per tap, column shift applied to the
                # OUTPUT slice (no lane-offset concatenate — see module
                # docstring)
                slab = planes[(p_r, p_c)][o_r:o_r + th]   # [TH, WPA, CA]
                yfull = jnp.dot(
                    slab.reshape(th * wpa, ca), w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                ).reshape(th, wpa, o)
                acc = acc + yfull[:, o_c:o_c + wo]
        out_ref[0] = acc.astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("pad_mode", "out_dtype", "interpret"))
def _down4_fwd_impl(x, w, pad_mode="same", out_dtype=jnp.bfloat16,
                    interpret=False):
    """k4 s2 down conv: x [N,H,W,C], w [4,4,C,O] -> [N,H/2,W/2,O].

    pad_mode "same" = zero ring (flax SAME); "reflect" = reflect ring
    (the U-Net pre-pads reflect then convolves VALID,
    pytorch_prototyping.py:258).
    """
    n, h, width, c = x.shape
    o = w.shape[-1]
    ho, wo = h // 2, width // 2
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="reflect" if pad_mode == "reflect" else "constant",
    )
    # one extra zero row/col so the parity split below is even-sized
    xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 1), (0, 0)))
    # column-parity planes: E holds xp cols 0,2,..., O holds 1,3,...
    e = xp[:, :, 0::2]   # [N, H+3, WO+1(+), C]
    od = xp[:, :, 1::2]
    e = e[:, :, :wo + 1]
    od = od[:, :, :wo + 1]

    th = max(_pick_th(wo, 4 * c, o) // 2, 1)
    # legacy heuristic above never grows; step DOWN while the kernel's
    # ACTUAL per-block working set (4 parity scratches + double-buffered
    # output at the requested dtype) exceeds budget (ADVICE r3).
    out_item = jnp.dtype(out_dtype).itemsize
    while th > 1 and _down4_vmem_bytes(
            th, wo, c, o, x.dtype.itemsize, out_item) > 13 * 1024 * 1024:
        th //= 2
    if _down4_vmem_bytes(th, wo, c, o, x.dtype.itemsize,
                         out_item) > 13 * 1024 * 1024:
        # unfittable even at TH=1 (f32 weights alone near the scoped
        # limit at C, O = 512) — XLA fallback
        return _xla_down4(x, w, pad_mode).astype(out_dtype)
    grid_rows = pl.cdiv(ho, th)
    row_pad = grid_rows * th * 2 + 2 - e.shape[1]
    if row_pad > 0:
        e = jnp.pad(e, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
        od = jnp.pad(od, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
    # DMA tile alignment of the parity planes (see _pick_th)
    wpa = _ru(wo + 1, 8)
    ca = _ru(c, 128)
    e = jnp.pad(e, ((0, 0), (0, 0), (0, wpa - (wo + 1)), (0, ca - c)))
    od = jnp.pad(od, ((0, 0), (0, 0), (0, wpa - (wo + 1)), (0, ca - c)))
    # row-parity split (Mosaic cannot strided-load 16-bit data in VMEM,
    # so the kernel must read contiguous rows): plane naming is
    # <row parity><col parity>
    ee, oe = e[:, 0::2], e[:, 1::2]
    eo, oo = od[:, 0::2], od[:, 1::2]

    # [dy, dx, C, O]; tap (dy, dx) = plane[dy%2, dx%2] at row/col offset
    # (dy//2, dx//2), each [C, O] plane lane-aligned
    wk = jnp.pad(w, ((0, 0), (0, 0), (0, ca - c), (0, 0))).astype(x.dtype)
    kernel = _down4_kernel(th, wo, wpa, c, ca, o, jnp.dtype(out_dtype))
    out = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, o), lambda nn, i: (nn, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, grid_rows * th, wo, o), jnp.dtype(out_dtype)
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 1, wpa, ca), x.dtype),
            pltpu.VMEM((th + 1, wpa, ca), x.dtype),
            pltpu.VMEM((th + 1, wpa, ca), x.dtype),
            pltpu.VMEM((th + 1, wpa, ca), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(ee, oe, eo, oo, wk)
    return out[:, :ho]


def _convt4_kernel(th, wi, wpa, c, ca, o, out_dtype):
    """Transpose conv k4 s2 SAME: out rows [2*i*TH, 2*i*TH+2*TH).

    lax.conv_transpose(SAME, transpose_kernel=False) is a CORRELATION on
    the 2x-dilated input (pinned by a 1D one-hot probe):
      out[2t]   = x[t-1] w[0] + x[t] w[2] = xq[t]   w[0] + xq[t+1] w[2]
      out[2t+1] = x[t]   w[1] + x[t+1] w[3] = xq[t+1] w[1] + xq[t+2] w[3]
    with xq = x zero-padded by 1.  Needs xq rows [t0, t0+TH+2).  Same
    decomposition for columns.
    """

    def kernel(xq_ref, w_ref, o00_ref, o01_ref, o10_ref, o11_ref,
               xs, sem):
        i = pl.program_id(1)
        n = pl.program_id(0)
        copy = pltpu.make_async_copy(
            xq_ref.at[n, pl.ds(i * th, th + 2)], xs, sem
        )
        copy.start()
        copy.wait()

        # one output ref per (row, col) parity — the [TH, 2, WI, 2, O]
        # in-kernel interleave reshape is a sublane/lane shuffle Mosaic
        # has no lowering for; XLA interleaves the four HBM outputs
        out_refs = ((o00_ref, o01_ref), (o10_ref, o11_ref))
        for a in range(2):
            # (xq row offset, kernel row) pairs per output parity
            row_pairs = ((0, 0), (1, 2)) if a == 0 else ((1, 1), (2, 3))
            for b in range(2):
                col_pairs = ((0, 0), (1, 2)) if b == 0 else ((1, 1), (2, 3))
                acc = jnp.zeros((th, wi, o), jnp.float32)
                for (ro, wr) in row_pairs:
                    # full-slab dot per (row, col) tap; column shift on
                    # the OUTPUT slice (no lane-offset concatenate)
                    xflat = xs[ro:ro + th].reshape(th * wpa, ca)
                    for (co, wc) in col_pairs:
                        yfull = jnp.dot(
                            xflat, w_ref[wr, wc],
                            preferred_element_type=jnp.float32,
                        ).reshape(th, wpa, o)
                        acc = acc + yfull[:, co:co + wi]
                out_refs[a][b][0] = acc.astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _convt4_fwd_impl(x, w, out_dtype=jnp.bfloat16, interpret=False):
    """k4 s2 SAME transpose conv: x [N,H,W,C], w [4,4,C,O] -> [N,2H,2W,O]."""
    n, h, width, c = x.shape
    o = w.shape[-1]
    xq = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    th = max(_pick_th(width, 2 * c, 4 * o) // 2, 1)
    # as in down4: never grow past the legacy pick, but honour the
    # actual allocation model (4 double-buffered parity outputs at the
    # requested dtype — f32 in the down4-dgrad reuse).
    out_item = jnp.dtype(out_dtype).itemsize
    while th > 1 and _convt4_vmem_bytes(
            th, width, c, o, x.dtype.itemsize, out_item) > 13 * 1024 * 1024:
        th //= 2
    if _convt4_vmem_bytes(th, width, c, o, x.dtype.itemsize,
                          out_item) > 13 * 1024 * 1024:
        return _xla_convt4(x, w).astype(out_dtype)
    grid_rows = pl.cdiv(h, th)
    row_pad = grid_rows * th + 2 - xq.shape[1]
    if row_pad > 0:
        xq = jnp.pad(xq, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
    # DMA tile alignment (see _pick_th)
    wpa = _ru(width + 2, 8)
    ca = _ru(c, 128)
    xq = jnp.pad(
        xq, ((0, 0), (0, 0), (0, wpa - (width + 2)), (0, ca - c))
    )

    # [4, 4, C, O] indexed [wr, wc] in-kernel
    wk = jnp.pad(w, ((0, 0), (0, 0), (0, ca - c), (0, 0))).astype(x.dtype)
    kernel = _convt4_kernel(th, width, wpa, c, ca, o, jnp.dtype(out_dtype))
    par_spec = pl.BlockSpec(
        (1, th, width, o), lambda nn, i: (nn, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    par_shape = jax.ShapeDtypeStruct(
        (n, grid_rows * th, width, o), jnp.dtype(out_dtype)
    )
    o00, o01, o10, o11 = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[par_spec] * 4,
        out_shape=[par_shape] * 4,
        scratch_shapes=[
            pltpu.VMEM((th + 2, wpa, ca), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xq, wk)
    # interleave parities in XLA: [N, R, 2(a), WI, 2(b), O] ->
    # [N, 2R, 2WI, O]
    y = jnp.stack(
        [jnp.stack([o00, o01], axis=3), jnp.stack([o10, o11], axis=3)],
        axis=2,
    )
    out = y.reshape(n, grid_rows * th * 2, 2 * width, o)
    return out[:, :2 * h]


def _xla_down4(x, w, pad_mode="same"):
    if pad_mode == "reflect":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        pad = [(0, 1), (0, 1)]
    else:
        pad = [(1, 2), (1, 2)]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _xla_convt4(x, w):
    return jax.lax.conv_transpose(
        x, w.astype(x.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def down4(x, w, pad_mode="same", interpret=False):
    """4x4 stride-2 conv (Pallas fwd; Pallas dgrad for "same", XLA wgrad).

    With pad_mode="reflect" the input gradient also routes through XLA
    (the reflect-pad adjoint's border folds aren't worth a hand-rolled
    kernel for these shapes); the forward stays on the Pallas path.
    """
    return _down4_fwd_impl(
        x, w, pad_mode=pad_mode, out_dtype=x.dtype, interpret=interpret
    )


def _down4_fwd(x, w, pad_mode, interpret):
    return down4(x, w, pad_mode, interpret), (x, w)


def _down4_bwd(pad_mode, interpret, res, g):
    x, w = res
    g = g.astype(x.dtype)
    if pad_mode == "same":
        # dgrad: transpose conv of g with the spatially-flipped,
        # io-swapped kernel (adjoint of the stride-2 correlation;
        # pinned by tests).
        wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # [4,4,O,C]
        dx = _convt4_fwd_impl(
            g, wt, out_dtype=jnp.float32, interpret=interpret
        ).astype(x.dtype)
        _, wgrad = jax.vjp(lambda w_: _xla_down4(x, w_, pad_mode), w)
        (dw,) = wgrad(g)
    else:
        _, vjp_fn = jax.vjp(lambda x_, w_: _xla_down4(x_, w_, pad_mode),
                            x, w)
        dx, dw = vjp_fn(g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


down4.defvjp(_down4_fwd, _down4_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def convt4(x, w, interpret=False):
    """4x4 stride-2 SAME transpose conv (Pallas fwd/dgrad, XLA wgrad)."""
    return _convt4_fwd_impl(x, w, out_dtype=x.dtype, interpret=interpret)


def _convt4_fwd(x, w, interpret):
    return convt4(x, w, interpret), (x, w)


def _convt4_bwd(interpret, res, g):
    x, w = res
    # adjoint of the transpose conv = the stride-2 down conv with the
    # spatially-flipped, io-swapped kernel
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _down4_fwd_impl(
        g.astype(x.dtype), wt, out_dtype=jnp.float32, interpret=interpret
    ).astype(x.dtype)
    _, wgrad = jax.vjp(lambda w_: _xla_convt4(x, w_), w)
    (dw,) = wgrad(g.astype(x.dtype))
    return dx, dw.astype(w.dtype)


convt4.defvjp(_convt4_fwd, _convt4_bwd)


# ---------------------------------------------------------------------------
# Slab conv: row-im2col in XLA + ONE wide dot per tile
# ---------------------------------------------------------------------------
#
# The tap-wise kernel above runs 9 dots of [M, C] @ [C, O] per tile —
# K = C and N = O, which at the U-Net's level-0 shapes (C = O = 64)
# half-fills both MXU dimensions (the round-4 "conv wall").  This
# variant restores full occupancy structurally:
#
#   * XLA materializes a ROW im2col slab [N, H, W+2, 3C] (three
#     row-shifted copies of the padded input concatenated on channels —
#     lane concatenation is legal in XLA, just not inside Mosaic).  HBM
#     cost: ~3x the activation bytes, ~0.2 ms at 512^2/C64 against HBM
#     bandwidth.
#   * the kernel runs ONE dot per row tile: [TH*WPA, 3C] @ [3C, 3O],
#     where the weight matrix packs all 9 taps ([dy*C+c, dx*O+o] =
#     w[dy, dx, c, o]); the dx column shift lands on OUTPUT slices
#     (acc += yfull[:, dx:dx+W, dx*O:(dx+1)*O]) exactly like the
#     tap-wise kernel — K = 3C, N = 3O (192x192 at level 0).
#   * the weight gradient becomes one dot per tile too:
#     dWcat [3C, 3O] = slab^T @ g3, with g3 [N, H, W+2, 3O] the
#     column-shifted copies of the cotangent built in XLA.
#
# Channel extents are zero-padded to multiples of 128 lanes; zero
# weights keep the padding inert.


def _conv3x3_slab_vmem_bytes(th, w, kc, no, x_item, out_item):
    """Per-block VMEM model: double-buffered slab block + packed weights
    + f32 yfull/acc + double-buffered output block."""
    wpa = _ru(w + 2, 8)
    xs = 2 * th * wpa * kc * x_item
    wgt = kc * no * x_item
    yfull = th * wpa * no * 4
    acc = th * w * (no // 3) * 4
    out = 2 * th * w * (no // 3) * out_item
    return xs + wgt + yfull + acc + out


def _pick_th_slab(w, kc, no, x_item, out_item,
                  budget=13 * 1024 * 1024):
    for th in (32, 16, 8, 4, 2, 1):
        if _conv3x3_slab_vmem_bytes(th, w, kc, no, x_item,
                                    out_item) <= budget:
            return th
    return 1


def _slab_kernel(th, w, wpa, kc, o, slope, fuse_act, out_dtype):
    def kernel(xs_ref, w_ref, b_ref, out_ref):
        yfull = jnp.dot(
            xs_ref[0].reshape(th * wpa, kc), w_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(th, wpa, 3 * o)
        acc = (yfull[:, 0:w, 0:o]
               + yfull[:, 1:1 + w, o:2 * o]
               + yfull[:, 2:2 + w, 2 * o:3 * o])
        y = acc + b_ref[0].astype(jnp.float32)[None, None, :]
        if fuse_act:
            y = jnp.where(y > 0, y, slope * y)
        out_ref[0] = y.astype(out_dtype)

    return kernel


def _slab_kc(c: int) -> int:
    """K extent of the slab: 3C rounded up to 128 lanes by default.

    RNR_SLAB_LANE_PAD=0 keeps the raw 3C (e.g. 192 at C=64 — 25% fewer
    K cycles IF Mosaic handles non-128-multiple lane extents in blocked
    specs; the r3 alignment lesson was for manual ANY-space DMAs, so
    this is probed on device rather than assumed either way).
    """
    import os

    if os.environ.get("RNR_SLAB_LANE_PAD", "1") == "0":
        return 3 * c
    return _ru(3 * c, 128)


def _make_slab(x, pad_mode):
    """[N,H,W,C] -> padded row-im2col slab [N, H, WPA, 3C] (+ wpa)."""
    n, h, width, c = x.shape
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="reflect" if pad_mode == "reflect" else "constant",
    )
    slab = jnp.concatenate(
        [xp[:, 0:h], xp[:, 1:h + 1], xp[:, 2:h + 2]], axis=-1
    )  # [N, H, W+2, 3C]
    wpa = _ru(width + 2, 8)
    slab = jnp.pad(slab, ((0, 0), (0, 0), (0, wpa - (width + 2)), (0, 0)))
    return slab, wpa


def _pack_w_slab(w, kc):
    """w [3,3,C,O] -> [KC, 3O] with [dy*C+c, dx*O+o] = w[dy,dx,c,o],
    zero-padded on K to kc."""
    c, o = w.shape[2], w.shape[3]
    wcat = jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * c, 3 * o)
    return jnp.pad(wcat, ((0, kc - 3 * c), (0, 0)))


@partial(jax.jit, static_argnames=("pad_mode", "fuse_act", "slope",
                                   "out_dtype", "interpret"))
def _conv3x3_slab_fwd_impl(x, w, b, pad_mode="same", fuse_act=False,
                           slope=0.2, out_dtype=jnp.bfloat16,
                           interpret=False):
    n, h, width, c = x.shape
    o = w.shape[-1]
    kc = _slab_kc(c)
    out_item = jnp.dtype(out_dtype).itemsize
    th = _pick_th_slab(width, kc, 3 * o, x.dtype.itemsize, out_item)
    if (_conv3x3_slab_vmem_bytes(th, width, kc, 3 * o, x.dtype.itemsize,
                                 out_item) > 13 * 1024 * 1024):
        return _conv3x3_fwd_impl(x, w, b, pad_mode=pad_mode,
                                 fuse_act=fuse_act, slope=slope,
                                 out_dtype=out_dtype, interpret=interpret)
    slab, wpa = _make_slab(x, pad_mode)
    slab = jnp.pad(slab, ((0, 0), (0, 0), (0, 0), (0, kc - 3 * c)))
    grid_rows = pl.cdiv(h, th)
    row_pad = grid_rows * th - h
    if row_pad:
        slab = jnp.pad(slab, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
    wk = _pack_w_slab(w, kc).astype(x.dtype)
    bk = b.astype(jnp.float32).reshape(1, o)
    kernel = _slab_kernel(th, width, wpa, kc, o, slope, fuse_act,
                          jnp.dtype(out_dtype))
    out = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec((1, th, wpa, kc), lambda nn, i: (nn, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, width, o), lambda nn, i: (nn, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, grid_rows * th, width, o), jnp.dtype(out_dtype)
        ),
        interpret=interpret,
    )(slab, wk, bk)
    return out[:, :h]


def _slab_wgrad_kernel(th, w, wpa, kc, no):
    def kernel(xs_ref, g3_ref, dw_ref):
        i = pl.program_id(1)
        n = pl.program_id(0)
        first = (i == 0) & (n == 0)

        @pl.when(first)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        dw_ref[...] = dw_ref[...] + jax.lax.dot_general(
            xs_ref[0].reshape(th * wpa, kc),
            g3_ref[0].reshape(th * wpa, no),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@partial(jax.jit, static_argnames=("pad_mode", "interpret"))
def _conv3x3_slab_wgrad_impl(x, g, pad_mode="same", interpret=False):
    """dW [3,3,C,O] f32: one [KC, 3O] dot per tile.

    dWcat[dy*C+c, dx*O+o] = sum_p slab[p][dy*C+c] * g[p_row, p_col-dx][o]
    — g3 packs the three column-shifted cotangent copies on lanes.
    """
    n, h, width, c = x.shape
    o = g.shape[-1]
    kc = _slab_kc(c)
    no = 3 * o
    # reuse the fwd VMEM model with the g3 block standing in for yfull
    th = _pick_th_slab(width, kc, no, x.dtype.itemsize, 4)
    if (_conv3x3_slab_vmem_bytes(th, width, kc, no, x.dtype.itemsize,
                                 4) > 13 * 1024 * 1024):
        return _conv3x3_wgrad_impl(x, g, pad_mode=pad_mode,
                                   interpret=interpret)
    slab, wpa = _make_slab(x, pad_mode)
    slab = jnp.pad(slab, ((0, 0), (0, 0), (0, 0), (0, kc - 3 * c)))
    # g3 [N, H, WPA, 3O]: lane-block dx holds g shifted so that slab
    # column j pairs with output column j - 1 + ... inverse of the
    # forward's acc += yfull[:, dx:dx+w, dx*O:]: slab col (j+dx) hits
    # output col j, so g3[:, :, col, dx*O:] = g[:, :, col - dx] with
    # g logically at slab cols [dx, dx+w).
    gp = g.astype(x.dtype)
    g3 = jnp.concatenate(
        [jnp.pad(gp, ((0, 0), (0, 0), (dx, wpa - width - dx), (0, 0)))
         for dx in range(3)],
        axis=-1,
    )  # [N, H, WPA, 3O]
    grid_rows = pl.cdiv(h, th)
    row_pad = grid_rows * th - h
    if row_pad:
        slab = jnp.pad(slab, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
        g3 = jnp.pad(g3, ((0, 0), (0, row_pad), (0, 0), (0, 0)))
    kernel = _slab_wgrad_kernel(th, width, wpa, kc, no)
    dwcat = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec((1, th, wpa, kc), lambda nn, i: (nn, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wpa, no), lambda nn, i: (nn, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kc, no), lambda nn, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kc, no), jnp.float32),
        interpret=interpret,
    )(slab, g3)
    # unpack [KC, 3O] -> [3, 3, C, O]
    dw = dwcat[:3 * c].reshape(3, c, 3, o)
    return jnp.transpose(dw, (0, 2, 1, 3))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def conv3x3s(x, w, b, pad_mode="same", fuse_act=False, slope=0.2,
             interpret=False):
    """Slab-formulation 3x3 conv — same contract as `conv3x3`."""
    return _conv3x3_slab_fwd_impl(
        x, w, b, pad_mode=pad_mode, fuse_act=fuse_act, slope=slope,
        out_dtype=x.dtype, interpret=interpret,
    )


def _conv3x3s_fwd(x, w, b, pad_mode, fuse_act, slope, interpret):
    out = _conv3x3_slab_fwd_impl(
        x, w, b, pad_mode=pad_mode, fuse_act=fuse_act, slope=slope,
        out_dtype=x.dtype, interpret=interpret,
    )
    return out, (x, w, out if fuse_act else None)


def _conv3x3s_bwd(pad_mode, fuse_act, slope, interpret, res, g):
    x, w, out = res
    g = g.astype(x.dtype)
    if fuse_act:
        g = jnp.where(out > 0, g, (slope * g.astype(jnp.float32)).astype(
            x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    w_rot = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    zeros_c = jnp.zeros((w.shape[2],), jnp.float32)
    if pad_mode == "same":
        dx = _conv3x3_slab_fwd_impl(
            g, w_rot, zeros_c, pad_mode="same", fuse_act=False,
            slope=slope, out_dtype=jnp.float32, interpret=interpret,
        )
    else:
        gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dxp = _conv3x3_slab_fwd_impl(
            gp, w_rot, zeros_c, pad_mode="same", fuse_act=False,
            slope=slope, out_dtype=jnp.float32, interpret=interpret,
        )
        dx = dxp[:, 1:-1, 1:-1]
        dx = dx.at[:, 1, :].add(dxp[:, 0, 1:-1])
        dx = dx.at[:, -2, :].add(dxp[:, -1, 1:-1])
        dx = dx.at[:, :, 1].add(dxp[:, 1:-1, 0])
        dx = dx.at[:, :, -2].add(dxp[:, 1:-1, -1])
        dx = dx.at[:, 1, 1].add(dxp[:, 0, 0])
        dx = dx.at[:, 1, -2].add(dxp[:, 0, -1])
        dx = dx.at[:, -2, 1].add(dxp[:, -1, 0])
        dx = dx.at[:, -2, -2].add(dxp[:, -1, -1])
    return dx.astype(x.dtype), _conv3x3_slab_wgrad_impl(
        x, g, pad_mode=pad_mode, interpret=interpret
    ).astype(w.dtype), db.astype(jnp.float32)


conv3x3s.defvjp(_conv3x3s_fwd, _conv3x3s_bwd)


# ---------------------------------------------------------------------------
# Slab down conv: k4 s2 as TWO wide dots per tile
# ---------------------------------------------------------------------------
#
# Same structural idea as conv3x3s applied to the encoder's 4x4 stride-2
# conv: XLA packs the four input rows of every output row on channels
# (slab [N, HO, W+2, 4C]) and splits columns by parity (even/odd planes,
# the r3 "no strided 16-bit loads" rule), and the kernel runs one
# [TH*WPA, 4C] @ [4C, 2O] dot per column-parity plane — K = 4C, N = 2O
# (256 x 256 at the level-0 shape C=64, O=128) instead of sixteen
# K = C, N = O taps.  Column shifts land on output slices.


def _down4s_vmem_bytes(th, wo, kc, o, x_item, out_item):
    wpa = _ru(wo + 1, 8)
    xs = 2 * 2 * th * wpa * kc * x_item       # two double-buffered slabs
    wgt = 2 * kc * 2 * o * x_item
    yfull = th * wpa * 2 * o * 4
    acc = th * wo * o * 4
    out = 2 * th * wo * o * out_item
    return xs + wgt + yfull + acc + out


def _pick_th_down4s(wo, kc, o, x_item, out_item,
                    budget=13 * 1024 * 1024):
    for th in (32, 16, 8, 4, 2, 1):
        if _down4s_vmem_bytes(th, wo, kc, o, x_item, out_item) <= budget:
            return th
    return 1


def _down4s_kernel(th, wo, wpa, kc, o, out_dtype):
    def kernel(e_ref, o_ref, we_ref, wo_ref, out_ref):
        acc = jnp.zeros((th, wo, o), jnp.float32)
        for plane_ref, w_ref in ((e_ref, we_ref), (o_ref, wo_ref)):
            yfull = jnp.dot(
                plane_ref[0].reshape(th * wpa, kc), w_ref[...],
                preferred_element_type=jnp.float32,
            ).reshape(th, wpa, 2 * o)
            acc = (acc + yfull[:, 0:wo, 0:o]
                   + yfull[:, 1:1 + wo, o:2 * o])
        out_ref[0] = acc.astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("pad_mode", "out_dtype", "interpret"))
def _down4s_fwd_impl(x, w, pad_mode="same", out_dtype=jnp.bfloat16,
                     interpret=False):
    """k4 s2 down conv, slab formulation: x [N,H,W,C] -> [N,H/2,W/2,O]."""
    n, h, width, c = x.shape
    o = w.shape[-1]
    ho, wo = h // 2, width // 2
    kc = (4 * c if _slab_kc(c) == 3 * c else _ru(4 * c, 128))
    out_item = jnp.dtype(out_dtype).itemsize
    th = _pick_th_down4s(wo, kc, o, x.dtype.itemsize, out_item)
    if _down4s_vmem_bytes(th, wo, kc, o, x.dtype.itemsize,
                          out_item) > 13 * 1024 * 1024:
        return _down4_fwd_impl(x, w, pad_mode=pad_mode,
                               out_dtype=out_dtype, interpret=interpret)
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="reflect" if pad_mode == "reflect" else "constant",
    )
    # rows needed: 2*HO + 2 <= H + 2 always; cols: 2*WO + 2 <= W + 2
    grid_rows = pl.cdiv(ho, th)
    ho_pad = grid_rows * th
    need_rows = 2 * ho_pad + 2
    if need_rows > xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - xp.shape[1]),
                          (0, 0), (0, 0)))
    # row slab: channel block dy holds xp row 2i+dy for output row i
    slab = jnp.concatenate(
        [xp[:, dy:dy + 2 * ho_pad:2] for dy in range(4)], axis=-1
    )  # [N, HO_pad, W+2, 4C]
    # column parity planes (even cols = dx 0/2, odd = dx 1/3)
    e = slab[:, :, 0::2][:, :, :wo + 1]
    od = slab[:, :, 1::2][:, :, :wo + 1]
    wpa = _ru(wo + 1, 8)
    e = jnp.pad(e, ((0, 0), (0, 0), (0, wpa - (wo + 1)),
                    (0, kc - 4 * c)))
    od = jnp.pad(od, ((0, 0), (0, 0), (0, wpa - (wo + 1)),
                      (0, kc - 4 * c)))
    # packed weights: wcatE[dy*C+c, co*O+o] = w[dy, 2*co, c, o]
    wt = jnp.transpose(w, (0, 2, 1, 3))  # [4, C, 4, O]
    we = jnp.pad(
        wt[:, :, 0::2].reshape(4 * c, 2 * o), ((0, kc - 4 * c), (0, 0))
    ).astype(x.dtype)
    wod = jnp.pad(
        wt[:, :, 1::2].reshape(4 * c, 2 * o), ((0, kc - 4 * c), (0, 0))
    ).astype(x.dtype)
    kernel = _down4s_kernel(th, wo, wpa, kc, o, jnp.dtype(out_dtype))
    out = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[
            pl.BlockSpec((1, th, wpa, kc), lambda nn, i: (nn, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wpa, kc), lambda nn, i: (nn, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, o), lambda nn, i: (nn, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, ho_pad, wo, o), jnp.dtype(out_dtype)
        ),
        interpret=interpret,
    )(e, od, we, wod)
    return out[:, :ho]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def down4s(x, w, pad_mode="same", interpret=False):
    """Slab-formulation 4x4 stride-2 conv — same contract as `down4`."""
    return _down4s_fwd_impl(
        x, w, pad_mode=pad_mode, out_dtype=x.dtype, interpret=interpret
    )


def _down4s_fwd(x, w, pad_mode, interpret):
    return down4s(x, w, pad_mode, interpret), (x, w)


def _down4s_bwd(pad_mode, interpret, res, g):
    # identical adjoints to down4 (the formulations compute the same op)
    return _down4_bwd(pad_mode, interpret, res, g)


down4s.defvjp(_down4s_fwd, _down4s_bwd)


# ---------------------------------------------------------------------------
# Slab transpose conv: k4 s2 SAME as FOUR wide dots per tile
# ---------------------------------------------------------------------------
#
# Decoder counterpart of down4s.  Per output parity (a, b) the transpose
# conv is a 2x2 correlation on the ring-padded input (see _convt4_kernel
# for the tap identity); the slab formulation packs the two input rows of
# each output row on channels (two slabs: row offsets (0,1) for a=0 and
# (1,2) for a=1) and the two column taps on the N dimension — one
# [TH*WPA, 2C] @ [2C, 2O] dot per parity instead of four K=C, N=O taps.


def _convt4s_vmem_bytes(th, wi, kc, o, x_item, out_item):
    wpa = _ru(wi + 2, 8)
    xs = 2 * 2 * th * wpa * kc * x_item      # two double-buffered slabs
    wgt = 4 * kc * 2 * o * x_item
    yfull = 2 * th * wpa * 2 * o * 4
    outs = 4 * 2 * th * wi * o * out_item
    return xs + wgt + yfull + outs


def _pick_th_convt4s(wi, kc, o, x_item, out_item,
                     budget=13 * 1024 * 1024):
    for th in (32, 16, 8, 4, 2, 1):
        if _convt4s_vmem_bytes(th, wi, kc, o, x_item, out_item) <= budget:
            return th
    return 1


def _convt4s_kernel(th, wi, wpa, kc, o, out_dtype):
    def kernel(s0_ref, s1_ref, w00_ref, w01_ref, w10_ref, w11_ref,
               o00_ref, o01_ref, o10_ref, o11_ref):
        slabs = (s0_ref, s1_ref)
        w_refs = ((w00_ref, w01_ref), (w10_ref, w11_ref))
        out_refs = ((o00_ref, o01_ref), (o10_ref, o11_ref))
        for a in range(2):
            slab = slabs[a][0].reshape(th * wpa, kc)
            for b in range(2):
                yfull = jnp.dot(
                    slab, w_refs[a][b][...],
                    preferred_element_type=jnp.float32,
                ).reshape(th, wpa, 2 * o)
                acc = (yfull[:, b:b + wi, 0:o]
                       + yfull[:, b + 1:b + 1 + wi, o:2 * o])
                out_refs[a][b][0] = acc.astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _convt4s_fwd_impl(x, w, out_dtype=jnp.bfloat16, interpret=False):
    """k4 s2 SAME transpose conv, slab formulation:
    x [N,H,W,C], w [4,4,C,O] -> [N,2H,2W,O]."""
    n, h, width, c = x.shape
    o = w.shape[-1]
    kc = (2 * c if _slab_kc(c) == 3 * c else _ru(2 * c, 128))
    out_item = jnp.dtype(out_dtype).itemsize
    th = _pick_th_convt4s(width, kc, o, x.dtype.itemsize, out_item)
    if _convt4s_vmem_bytes(th, width, kc, o, x.dtype.itemsize,
                           out_item) > 13 * 1024 * 1024:
        return _convt4_fwd_impl(x, w, out_dtype=out_dtype,
                                interpret=interpret)
    xq = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid_rows = pl.cdiv(h, th)
    rr = grid_rows * th
    if rr + 2 > xq.shape[1]:
        xq = jnp.pad(xq, ((0, 0), (0, rr + 2 - xq.shape[1]),
                          (0, 0), (0, 0)))
    slab0 = jnp.concatenate([xq[:, 0:rr], xq[:, 1:rr + 1]], axis=-1)
    slab1 = jnp.concatenate([xq[:, 1:rr + 1], xq[:, 2:rr + 2]], axis=-1)
    wpa = _ru(width + 2, 8)
    pad_spec = ((0, 0), (0, 0), (0, wpa - (width + 2)), (0, kc - 2 * c))
    slab0 = jnp.pad(slab0, pad_spec)
    slab1 = jnp.pad(slab1, pad_spec)
    # wcat_ab[ro*C+c, j*O+o] = w[2*ro+a, 2*j+b, c, o]
    wt = jnp.transpose(w, (0, 2, 1, 3))  # [4(row), C, 4(col), O]
    wcats = []
    for a in range(2):
        for b in range(2):
            wc = jnp.stack([wt[2 * 0 + a, :, 2 * 0 + b],
                            wt[2 * 0 + a, :, 2 * 1 + b]], axis=1)
            wc2 = jnp.stack([wt[2 * 1 + a, :, 2 * 0 + b],
                             wt[2 * 1 + a, :, 2 * 1 + b]], axis=1)
            cat = jnp.concatenate(
                [wc.reshape(c, 2 * o), wc2.reshape(c, 2 * o)], axis=0)
            wcats.append(
                jnp.pad(cat, ((0, kc - 2 * c), (0, 0))).astype(x.dtype))
    kernel = _convt4s_kernel(th, width, wpa, kc, o, jnp.dtype(out_dtype))
    slab_spec = pl.BlockSpec((1, th, wpa, kc), lambda nn, i: (nn, i, 0, 0),
                             memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, th, width, o), lambda nn, i: (nn, i, 0, 0),
                            memory_space=pltpu.VMEM)
    par_shape = jax.ShapeDtypeStruct((n, rr, width, o),
                                     jnp.dtype(out_dtype))
    o00, o01, o10, o11 = pl.pallas_call(
        kernel,
        grid=(n, grid_rows),
        in_specs=[slab_spec, slab_spec]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[par_spec] * 4,
        out_shape=[par_shape] * 4,
        interpret=interpret,
    )(slab0, slab1, *wcats)
    y = jnp.stack(
        [jnp.stack([o00, o01], axis=3), jnp.stack([o10, o11], axis=3)],
        axis=2,
    )
    out = y.reshape(n, rr * 2, 2 * width, o)
    return out[:, :2 * h]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def convt4s(x, w, interpret=False):
    """Slab-formulation 4x4 stride-2 SAME transpose conv."""
    return _convt4s_fwd_impl(x, w, out_dtype=x.dtype, interpret=interpret)


def _convt4s_fwd(x, w, interpret):
    return convt4s(x, w, interpret), (x, w)


def _convt4s_bwd(interpret, res, g):
    x, w = res
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _down4s_fwd_impl(
        g.astype(x.dtype), wt, out_dtype=jnp.float32, interpret=interpret
    ).astype(x.dtype)
    _, wgrad = jax.vjp(lambda w_: _xla_convt4(x, w_), w)
    (dw,) = wgrad(g.astype(x.dtype))
    return dx, dw.astype(w.dtype)


convt4s.defvjp(_convt4s_fwd, _convt4s_bwd)
