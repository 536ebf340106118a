"""Fused channel-attention "scale-and-excite" Pallas TPU kernel.

Computes ``out = x * sigmoid((relu(mean_hw(x) @ w1 + b1)) @ w2 + b2)`` — the reference's
CALayer (ref: Code/SISR/models/advanced/architectures.py:13-44) — as ONE pallas dispatch
instead of XLA's reduce + two dots + broadcast-multiply chain.

Design: a two-phase sequential grid ``(N, 2*n_tiles)`` over row-tiles of each (H, W, C)
feature map, using pallas's automatic double-buffered HBM<->VMEM pipelining (BlockSpec
blocks, so Mosaic handles lane-padding for C < 128):

* phase A (t < n_tiles): accumulate the spatial sum of each tile in a VMEM scratch;
  at the last A-tile, run the two tiny excitation matmuls (MXU) and stash the attention
  vector in scratch;
* phase B (t >= n_tiles): revisit each tile and write ``tile * att`` (VPU).

TPU grid steps run sequentially, so the phase-B writes of each (i, tile) block are the
final ones.  The map is read twice from HBM (inherent: the attention vector depends on
the full spatial reduction) but nothing intermediate is materialized in HBM.

Backward: custom VJP recomputing with plain jnp ops (the backward graph is elementwise
work XLA fuses into neighbours).

Measured on TPU v5e (f32, C=64, batch 8): bit-exact vs XLA at every shape; standalone
latency 0.65-3.4 ms vs XLA's 0.55-2.4 ms — XLA's fusion pipeline already runs this
memory-bound op at speed-of-light, and inside a full model it additionally fuses the
scale into neighbouring convs.  The kernel is therefore provided as an op
(``fused_channel_attention``) but NOT wired into CALayer by default.

ARCHIVED AS A PLAYBOOK (round 4).  The last candidate win — running the int8 RCAB
block tail (requant'd conv output -> CA scale -> residual add) as one kernel
(``fused_channel_attention_residual``) — was measured on v5e via
``tools/bench_pallas_epilogue``: standalone 0.81-1.00x XLA (bit-exact), and the
full int8 RCAN (10x20, batch 8, 128^2) runs at **0.47x** with the Pallas epilogue
(199.1 ms vs XLA's 94.3 ms per forward) — XLA fuses the whole f32 epilogue into
one elementwise pass over the int32 conv accumulator, while a separate kernel
dispatch must round-trip the feature map through HBM again.  Decision rule from
VERDICT r3 item 7 (wire only if e2e >= 1.05x): both kernels stay as bit-exact,
tested ops and a worked TPU-kernel playbook; no model path uses them by default.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _excite(pooled, w1_ref, b1_ref, w2_ref, b2_ref):
    """Shared excitation MLP: sigmoid(relu(pooled @ w1 + b1) @ w2 + b2), f32.
    ONE definition so the four kernel bodies cannot drift numerically."""
    hidden = jnp.maximum(
        jnp.dot(pooled, w1_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1_ref[...], 0.0)
    return jax.nn.sigmoid(
        jnp.dot(hidden, w2_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2_ref[...])


def _ca_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc_ref, att_ref, *,
               n_tiles, hw):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(t < n_tiles)
    def _():
        acc_ref[...] += jnp.sum(x_ref[0].astype(jnp.float32), axis=(0, 1))[None, :]

    @pl.when(t == n_tiles - 1)
    def _():
        att_ref[...] = _excite(acc_ref[...] / hw, w1_ref, b1_ref,
                               w2_ref, b2_ref)

    @pl.when(t >= n_tiles)
    def _():
        out_ref[...] = x_ref[...] * att_ref[...][0][None, None, None, :].astype(
            x_ref.dtype)


def _pick_tile(h, w, c, itemsize, budget=1024 * 1024):
    row_bytes = w * c * itemsize
    tile_h = max(1, min(h, budget // max(row_bytes, 1)))
    while h % tile_h:
        tile_h -= 1
    return tile_h


def _ca_kernel_single(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, hw):
    """Whole feature map resident in VMEM: one HBM read + one HBM write."""
    pooled = jnp.sum(x_ref[0].astype(jnp.float32), axis=(0, 1))[None, :] / hw
    att = _excite(pooled, w1_ref, b1_ref, w2_ref, b2_ref)
    out_ref[...] = x_ref[...] * att[0][None, None, None, :].astype(x_ref.dtype)


# pallas double-buffers both in and out blocks (4x the block size in VMEM)
_SINGLE_BLOCK_BUDGET = 3 * 1024 * 1024
# the CA+residual variant counts x+r bytes against this; with out and double
# buffering a 12 MB block keeps peak VMEM ~32 MB on a 128 MB part
_RES_SINGLE_BLOCK_BUDGET = 12 * 1024 * 1024


def _fused_ca_forward(x, w1, b1, w2, b2, interpret=False):
    n, h, w, c = x.shape
    weight_args = (w1, b1.reshape(1, -1).astype(jnp.float32), w2,
                   b2.reshape(1, -1).astype(jnp.float32))
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4

    if h * w * c * x.dtype.itemsize <= _SINGLE_BLOCK_BUDGET:
        # whole map fits VMEM: single pass, 1 read + 1 write
        return pl.pallas_call(
            functools.partial(_ca_kernel_single, hw=float(h * w)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(n,),
            in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + weight_specs,
            out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, *weight_args)

    tile_h = _pick_tile(h, w, c, x.dtype.itemsize)
    n_tiles = h // tile_h
    kern = functools.partial(_ca_kernel, n_tiles=n_tiles, hw=float(h * w))

    def in_index(i, t):
        return (i, jax.lax.rem(t, n_tiles), 0, 0)

    def out_index(i, t):
        # phase A parks the out block at tile 0 (no per-tile write-backs); phase B maps
        # each step to its real tile
        return (i, jnp.where(t < n_tiles, 0, t - n_tiles), 0, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n, 2 * n_tiles),
        in_specs=[pl.BlockSpec((1, tile_h, w, c), in_index,
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((1, tile_h, w, c), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(x, *weight_args)


def _ca_res_kernel_single(x_ref, r_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                          hw):
    """CA + residual-add epilogue, whole map in VMEM: out = x*att(x) + r."""
    pooled = jnp.sum(x_ref[0].astype(jnp.float32), axis=(0, 1))[None, :] / hw
    att = _excite(pooled, w1_ref, b1_ref, w2_ref, b2_ref)
    out_ref[...] = (x_ref[...].astype(jnp.float32)
                    * att[0][None, None, None, :]
                    + r_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _ca_res_kernel(x_ref, r_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc_ref,
                   att_ref, *, n_tiles, hw):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(t < n_tiles)
    def _():
        acc_ref[...] += jnp.sum(x_ref[0].astype(jnp.float32), axis=(0, 1))[None, :]

    @pl.when(t == n_tiles - 1)
    def _():
        att_ref[...] = _excite(acc_ref[...] / hw, w1_ref, b1_ref,
                               w2_ref, b2_ref)

    @pl.when(t >= n_tiles)
    def _():
        out_ref[...] = (x_ref[...].astype(jnp.float32)
                        * att_ref[...][0][None, None, None, :]
                        + r_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _fused_ca_res_forward(x, r, w1, b1, w2, b2, interpret=False):
    """out = x * sigmoid(excite(mean_hw(x))) + r, dtype of r — the RCAB block
    epilogue (requant'd conv output -> CA scale -> residual add) in ONE dispatch.

    Motivation (VERDICT r3 item 7): in the int8 serving path the conv output is
    f32 while the residual carry is bf16 — the XLA chain reads x for the pool,
    then re-reads x and r for the scale+add.  Fusing the add into the CA kernel's
    phase B removes one full-map HBM round trip relative to separate kernels."""
    n, h, w, c = x.shape
    weight_args = (w1, b1.reshape(1, -1).astype(jnp.float32), w2,
                   b2.reshape(1, -1).astype(jnp.float32))
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    out_dtype = r.dtype

    # larger budget than the plain-CA kernel: the single-block path is where the
    # fusion actually wins HBM traffic (1R(x)+1R(r)+1W vs XLA's 2R(x)+1R(r)+1W),
    # and v5e VMEM (~128 MB) comfortably holds a double-buffered 12 MB x+r block
    # (the e2e bench shape, 128^2 x 64 f32+bf16 per image, is 6.3 MB)
    if (h * w * c * (x.dtype.itemsize + r.dtype.itemsize)
            <= _RES_SINGLE_BLOCK_BUDGET):
        return pl.pallas_call(
            functools.partial(_ca_res_kernel_single, hw=float(h * w)),
            out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
            grid=(n,),
            in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2 + weight_specs,
            out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, r, *weight_args)

    tile_h = _pick_tile(h, w, c, x.dtype.itemsize + r.dtype.itemsize)
    n_tiles = h // tile_h
    kern = functools.partial(_ca_res_kernel, n_tiles=n_tiles, hw=float(h * w))

    def in_index(i, t):
        return (i, jax.lax.rem(t, n_tiles), 0, 0)

    def out_index(i, t):
        return (i, jnp.where(t < n_tiles, 0, t - n_tiles), 0, 0)

    # r is only READ in phase B: park its block during phase A (pallas fetches
    # blocks per index map whether or not the kernel reads them — streaming r in
    # phase A would re-spend the exact HBM round trip this fusion saves)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        grid=(n, 2 * n_tiles),
        in_specs=[pl.BlockSpec((1, tile_h, w, c), in_index,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_h, w, c), out_index,
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((1, tile_h, w, c), out_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(x, r, *weight_args)


def _reference_ca_res(x, r, w1, b1, w2, b2):
    """Plain-XLA CA + residual-add epilogue (identical math)."""
    return (_reference_ca(x, w1, b1, w2, b2).astype(jnp.float32)
            + r.astype(jnp.float32)).astype(r.dtype)


@jax.custom_vjp
def fused_channel_attention_residual(x, r, w1, b1, w2, b2):
    """Fused CA scale-and-excite + residual add (Pallas on TPU; XLA elsewhere)."""
    if jax.default_backend() == 'tpu':
        return _fused_ca_res_forward(x, r, w1, b1, w2, b2)
    return _reference_ca_res(x, r, w1, b1, w2, b2)


def _res_fwd(x, r, w1, b1, w2, b2):
    return fused_channel_attention_residual(x, r, w1, b1, w2, b2), \
        (x, r, w1, b1, w2, b2)


def _res_bwd(residuals, g):
    x, r, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(_reference_ca_res, x, r, w1, b1, w2, b2)
    return vjp(g)


fused_channel_attention_residual.defvjp(_res_fwd, _res_bwd)


def _reference_ca(x, w1, b1, w2, b2):
    """Plain-XLA implementation (identical math) for backward and fallback."""
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    hidden = jnp.maximum(pooled @ w1.astype(jnp.float32) + b1, 0.0)
    att = jax.nn.sigmoid(hidden @ w2.astype(jnp.float32) + b2)
    return x * att[:, None, None, :].astype(x.dtype)


@jax.custom_vjp
def fused_channel_attention(x, w1, b1, w2, b2):
    """Fused CA scale-and-excite (Pallas on TPU; plain XLA elsewhere)."""
    if jax.default_backend() == 'tpu':
        return _fused_ca_forward(x, w1, b1, w2, b2)
    return _reference_ca(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2):
    return fused_channel_attention(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(_reference_ca, x, w1, b1, w2, b2)
    return vjp(g)


fused_channel_attention.defvjp(_fwd, _bwd)
