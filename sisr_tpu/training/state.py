"""Functional training state + pure train/eval steps.

The reference's stateful ``BaseModel`` (optimizer/scheduler/criterion attached to an
nn.Module, ref: Code/SISR/models/__init__.py:257-575) becomes a flax ``TrainState``
pytree and jitted pure step functions:

* optimizer: optax adam (optionally with betas, ref: models/__init__.py:292-300),
  chained with global-norm gradient clipping (ref: models/__init__.py:484-485);
* the LR schedule advances once per optimizer step == once per batch, the reference's
  per-batch ``scheduler.step()`` semantics (models/__init__.py:488-489);
* buffers are donated so parameter memory is reused in place on device.
"""
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .schedulers import build_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None

    @classmethod
    def create(cls, apply_fn, params, tx, batch_stats=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=batch_stats,
                   apply_fn=apply_fn, tx=tx)


def build_optimizer(lr=1e-4, scheduler=None, scheduler_params=None, optimizer_params=None,
                    grad_clip=None):
    """adam (+betas) with per-step schedule and optional global-norm clipping."""
    schedule = build_schedule(lr, scheduler, scheduler_params)
    params = dict(optimizer_params or {})
    unknown = set(params) - {'beta_1', 'beta_2', 'eps', 'weight_decay'}
    if unknown:
        # silently dropping config keys would train with defaults while the
        # experiment log claims the configured values
        raise ValueError('Unsupported optimizer_params %s (supported: beta_1, '
                         'beta_2, eps, weight_decay)' % sorted(unknown))
    betas = (params.get('beta_1', 0.9), params.get('beta_2', 0.999))
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    wd = params.get('weight_decay', 0.0)
    if wd:
        # torch Adam weight_decay adds wd*param to the GRADIENT before the moment
        # updates — add_decayed_weights placed before adam reproduces that
        chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.adam(learning_rate=schedule, b1=betas[0], b2=betas[1],
                            eps=params.get('eps', 1e-8)))
    return optax.chain(*chain), schedule


def make_train_step(loss_fn, prep_fn, has_batch_stats=False, donate=True):
    """Build a jitted train step.

    :param loss_fn: (pred, target) -> scalar.
    :param prep_fn: pure fn (batch dict of arrays) -> (x, target, metadata-or-None):
        handler-specific metadata masking / expansion / concatenation, traced into the
        same XLA program as the model.
    :param has_batch_stats: thread a mutable batch_stats collection (BatchNorm models).
    """

    return jax.jit(_train_step_body(loss_fn, prep_fn, has_batch_stats),
                   donate_argnums=(0,) if donate else ())


def make_multi_train_step(loss_fn, prep_fn, has_batch_stats=False, donate=True):
    """Build a jitted K-step train function: one dispatch runs K optimizer steps via
    ``lax.scan`` over stacked batches (leaves shaped (K, B, ...)).

    This amortizes host->device dispatch latency across K steps — on remote-attached
    TPUs the per-call round trip otherwise dominates small-model training.
    Returns (new_state, losses[K]).
    """
    single = _train_step_body(loss_fn, prep_fn, has_batch_stats)

    def step(state, stacked_batch):
        return jax.lax.scan(single, state, stacked_batch)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _train_step_body(loss_fn, prep_fn, has_batch_stats):
    def step(state, batch):
        x, y, metadata = prep_fn(batch)

        def compute_loss(params):
            variables = {'params': params}
            kwargs = {}
            if metadata is not None:
                kwargs['metadata'] = metadata
            if has_batch_stats:
                variables['batch_stats'] = state.batch_stats
                out, mutated = state.apply_fn(variables, x, train=True,
                                              mutable=['batch_stats'], **kwargs)
                new_stats = mutated['batch_stats']
            else:
                out = state.apply_fn(variables, x, **kwargs)
                new_stats = state.batch_stats
            return loss_fn(out, y), new_stats

        (loss, new_stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, batch_stats=new_stats)
        return new_state, loss

    return step


def make_masked_eval_step(prep_fn, has_batch_stats=False):
    """Bucketed-eval forward step: the input is zero-padded to a bucket shape and
    ``batch['valid_hw']`` carries the true (h, w).  A mask context + conv interceptor
    keep the valid region bit-faithful to an unpadded run (see ops/masking.py);
    jit retraces once per BUCKET shape instead of once per image shape."""
    from flax import linen as nn
    from ..ops.masking import (spatial_masks, apply_mask, conv_mask_interceptor)

    def step(state, batch):
        bucket_hw = batch['lr'].shape[1:3]
        with spatial_masks(bucket_hw, batch['valid_hw']):
            x, _, metadata = prep_fn(batch)
            x = apply_mask(x)
            if metadata is not None and getattr(metadata, 'ndim', 0) == 4:
                metadata = apply_mask(metadata)
            variables = {'params': state.params}
            kwargs = {}
            if metadata is not None:
                kwargs['metadata'] = metadata
            if has_batch_stats:
                variables['batch_stats'] = state.batch_stats
                kwargs['train'] = False
            with nn.intercept_methods(conv_mask_interceptor):
                out = state.apply_fn(variables, x, **kwargs)
        return out

    return jax.jit(step)


def make_eval_step(loss_fn, prep_fn, has_batch_stats=False):
    """Build a jitted eval step: (state, batch) -> (sr_output, loss)."""

    def step(state, batch):
        x, y, metadata = prep_fn(batch)
        variables = {'params': state.params}
        kwargs = {}
        if metadata is not None:
            kwargs['metadata'] = metadata
        if has_batch_stats:
            variables['batch_stats'] = state.batch_stats
            kwargs['train'] = False
        out = state.apply_fn(variables, x, **kwargs)
        loss = loss_fn(out, y) if y is not None else jnp.zeros(())
        return out, loss

    return jax.jit(step)
