"""Exact bucketed-eval spatial masking.

Variable-size eval images under XLA's static shapes normally force one compile per
unique (H, W) (SURVEY §7 hard-part 2).  Bucketed eval instead zero-pads the LR image up
to a small set of bucket shapes and runs ONE compiled program per bucket.  Zero padding
alone is not bit-faithful: biases/activations make the pad region non-zero, and that
garbage bleeds back into the valid region through subsequent SAME convolutions, and
global average pools would average over the pad.  This module restores exactness:

* a thread-local mask context carries the (static) bucket resolution and the (dynamic)
  valid height/width through a traced eval step;
* :func:`conv_mask_interceptor` (used with ``flax.linen.intercept_methods``) re-zeros
  the pad region after every ``nn.Conv``, so each layer sees exactly the zero padding
  SAME convolution would have provided at the true image boundary;
* :func:`masked_global_mean` replaces ``jnp.mean(x, (1, 2))`` in channel-attention
  pooling so the average runs over valid pixels only.

With those two mechanisms, every pure-conv model in the zoo (plus the LAM/CSAM global
attentions, whose correlations are unaffected by zero-masked pads) produces outputs in
the valid region IDENTICAL to an unpadded run.  Models with strided downsampling
(SPARNet hourglass) or spatial-covariance pooling (SAN SOCA / non-local) are excluded:
their handlers keep per-shape compilation or the tiled path.

Masks are recomputed per activation resolution from the dynamic valid (h, w): an
activation at R times the bucket resolution is valid in its first (h*R, w*R) pixels.
"""
import threading

import jax.numpy as jnp
from flax import linen as nn

_ctx = threading.local()


def _state():
    return getattr(_ctx, 'state', None)


class spatial_masks:
    """Context manager enabling masking during an (eval-step) trace.

    :param bucket_hw: static padded (H, W) of the model input.
    :param valid_hw: dynamic int32 array [h, w] — the true image size.
    """

    def __init__(self, bucket_hw, valid_hw):
        self.value = (int(bucket_hw[0]), int(bucket_hw[1]), valid_hw)

    def __enter__(self):
        self._prev = getattr(_ctx, 'state', None)  # restore on exit: nesting-safe
        _ctx.state = self.value
        return self

    def __exit__(self, *exc):
        _ctx.state = self._prev
        return False


def valid_extent(shape):
    """Dynamic (valid_h, valid_w) for an (N, H, W, C) activation, or None if masking is
    off or the resolution is not an integer multiple of the bucket resolution.

    NB the None fallback means correctness is CONVENTION-enforced: a model whose
    activations leave the bucket-multiple grid (stride-2 convs, pooling pyramids)
    silently goes unmasked — such models must set ``bucketed_eval_ok = False`` on
    their handler (SAN/SPARNet do; see BaseHandler.bucketed_eval_ok)."""
    st = _state()
    if st is None or len(shape) != 4:
        return None
    bh, bw, valid_hw = st
    h_act, w_act = int(shape[1]), int(shape[2])
    if h_act <= 0 or w_act <= 0 or h_act % bh or w_act % bw:
        return None
    fh, fw = h_act // bh, w_act // bw
    return valid_hw[0] * fh, valid_hw[1] * fw


def mask_for(shape, dtype=jnp.float32):
    """(1, H, W, 1) validity mask for an activation shape, or None."""
    extent = valid_extent(shape)
    if extent is None:
        return None
    vh, vw = extent
    row = jnp.arange(shape[1])[:, None] < vh
    col = jnp.arange(shape[2])[None, :] < vw
    return (row & col)[None, :, :, None].astype(dtype)


def apply_mask(x):
    """Zero the pad region of a spatial activation (no-op outside a mask context)."""
    m = mask_for(getattr(x, 'shape', ()), dtype=x.dtype) if hasattr(x, 'shape') else None
    return x if m is None else x * m


def masked_global_mean(x, keepdims=False):
    """Global average pool over valid pixels only (falls back to jnp.mean)."""
    extent = valid_extent(x.shape)
    if extent is None:
        return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
    vh, vw = extent
    # sum/divide in f32: a bf16 pixel count is off by up to 0.07% (bf16(249001) =
    # 248832) and would break bit-faithfulness vs the unpadded run's jnp.mean
    count = (vh * vw).astype(jnp.float32)
    # x is already masked (convs re-zero pads), but mask again for safety: the mean
    # must not depend on upstream masking discipline
    total = jnp.sum(apply_mask(x).astype(jnp.float32), axis=(1, 2),
                    keepdims=keepdims)
    return (total / count).astype(x.dtype)


def conv_mask_interceptor(next_fun, args, kwargs, context):
    """flax interceptor: re-zero the pad region around every nn.Conv call.

    Inputs are masked so non-conv producers (broadcast metadata maps, mean shifts)
    cannot leak non-zero pad values into the convolution window at the true image
    boundary; outputs are masked so non-conv consumers (global attentions, residual
    stacks) see clean zeros in the pad region."""
    if (_state() is not None and context.method_name == '__call__'
            and isinstance(context.module, nn.Conv)):
        if args and hasattr(args[0], 'ndim') and getattr(args[0], 'ndim', 0) == 4:
            args = (apply_mask(args[0]),) + tuple(args[1:])
        out = next_fun(*args, **kwargs)
        if hasattr(out, 'ndim') and out.ndim == 4:
            out = apply_mask(out)
        return out
    return next_fun(*args, **kwargs)
