"""Model handlers: config-name -> Flax module + training semantics.

The reference attaches optimizer/scheduler/criterion to stateful ``*Handler(BaseModel)``
classes discovered by AST-scanning (ref: Code/SISR/models/__init__.py:20-30).  Here each
handler is a plain object registered under the same lowercase names, owning:

* the Flax module + its colorspace / input-mode contract (drives the eval pipeline
  exactly like the reference's ``colorspace`` / ``im_input`` attributes);
* the optax optimizer + per-step LR schedule + loss;
* the QModel metadata bookkeeping (ref: attention_manipulators/__init__.py:10-27):
  ``num_metadata`` counting rules, key-mask selection, vector vs spatial-map channels,
  the 'modulate' style's gaussian QPI expansion (ref: attention_manipulators/handlers.py:42-54);
* checkpoint (de)serialization with the reference's file contract
  (``saved_models/train_model_<N>``).

All metadata preparation is expressed as pure jax ops traced into the train/eval step, so
the whole batch -> SR pipeline is one XLA program.
"""
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from ..training.losses import build_loss
from ..training.state import (TrainState, build_optimizer, make_eval_step,
                              make_masked_eval_step, make_train_step)
from . import basic, advanced, san, qmodels, sftmd, sparnet
from .feature_extractors import load_vgg_extractor

available_models = {}

# handler-side name -> reference checkpoint key for optional adversarial components
# (ref: models/__init__.py:368-380 save, 445-456 load)
_GAN_STATE_KEYS = (('params', 'discriminator'), ('opt_state', 'optimizer_D'),
                   ('scheduler', 'scheduler_D'), ('steps', 'steps'))


def register_model(name, *aliases):
    def wrap(cls):
        available_models[name] = cls
        for alias in aliases:
            available_models[alias] = cls
        cls.model_name = name
        return cls
    return wrap


def define_model(name, **kwargs):
    """Registry lookup (ref: models/__init__.py:225-227)."""
    if name not in available_models:
        raise KeyError('Unknown model %r; available: %s' % (name, sorted(available_models)))
    return available_models[name](**kwargs)


# Families where --int8 was MEASURED end-to-end slower than bf16 on v5e (README
# "int8 serving" table, batch 16, 4x 128->512); set_int8 warns at the point of use.
INT8_MEASURED_SLOWER = {'sftmd': '0.83x bf16', 'han': '0.73x', 'qhan': '0.73x'}


class BaseHandler:
    """Functional handler base (replaces ref models/__init__.py:257-575 BaseModel)."""

    colorspace = 'rgb'
    im_input = 'unmodified'
    loss_type = 'l1'
    grad_clip = None
    in_channels = 3
    uses_metadata = False
    channel_concat = False  # concat metadata maps onto the network input (SRMD/SFTMD-concat)
    tiled_eval = False      # SAN-style static tile-grid eval for large images
    # exact bucketed eval is valid for pure-conv models (+ LAM/CSAM); spatial-softmax /
    # covariance pooling (SAN non-local, SOCA) and strided norms (SPARNet) are excluded
    bucketed_eval_ok = True
    # int8 serving fast path (ops/quantization.py): family key or None if unsupported
    int8_family = None

    def __init__(self, eval_mode=False, lr=1e-4, scale=4, scheduler=None,
                 scheduler_params=None, perceptual=None, optimizer_params=None,
                 grad_clip=None, dtype=None, vgg_weights=None, seed=8,
                 max_combined_im_size=160000, **kwargs):
        self.eval_mode = eval_mode
        self.scale = scale
        self.lr = lr
        self.curr_epoch = 0
        # 'msgpack' (default, the reference's single-file contract) or 'orbax'
        # (directory checkpoints via orbax.checkpoint; loading auto-detects either)
        self.checkpoint_backend = kwargs.pop('checkpoint_backend', 'msgpack')
        # background checkpoint writes (utils/async_ckpt.py): the epoch loop resumes
        # stepping while the state crosses to the host and hits disk.  On a remote-
        # attached chip the full-state save, not compute, set the epoch pace
        # (measured: 517 MB at ~35 MB/s for EDSR 256f).  Readers/deleters fence via
        # wait_pending_checkpoints().  `async_checkpoint = false` restores the
        # reference's synchronous-save behavior exactly.
        self.async_checkpoint = bool(kwargs.pop('async_checkpoint', True))
        # 'f32' (default: the reference's exact full-state contract) or
        # 'bf16_moments': Adam moments cross to the host and land on disk as
        # bfloat16 — 2/3 of the state bytes halve, cutting the per-epoch transfer
        # floor on a remote-attached chip.  Resume is approximate in the moments
        # (<0.4% relative rounding, params always exact); load casts them back to
        # the optimizer template's dtypes so training continues at full precision.
        self.checkpoint_dtype = kwargs.pop('checkpoint_dtype', 'f32')
        if self.checkpoint_dtype not in ('f32', 'bf16_moments'):
            raise ValueError("checkpoint_dtype must be 'f32' or 'bf16_moments', got %r"
                             % (self.checkpoint_dtype,))
        self.dtype = jnp.bfloat16 if dtype in ('bf16', 'bfloat16') else jnp.float32
        self.max_combined_im_size = max_combined_im_size
        if grad_clip == 0:  # explicit 0 DISABLES clipping, incl. subclass defaults
            self.grad_clip = None  # (ref: models/__init__.py:281-284)
        elif grad_clip is not None:
            self.grad_clip = grad_clip

        self.module = self.build_module(scale=scale, dtype=self.dtype, **kwargs)
        self.tx, self.schedule = build_optimizer(lr, scheduler, scheduler_params,
                                                 optimizer_params, self.grad_clip)
        # the reference only wraps the criterion with the perceptual mechanism for
        # training (training_setup gates on eval_mode, models/__init__.py:334-342)
        use_perceptual = perceptual if (perceptual is not None and not eval_mode) else None
        vgg_apply = load_vgg_extractor(vgg_weights) if use_perceptual is not None else None
        self.loss_fn = build_loss(self.loss_type, use_perceptual, vgg_apply)

        self.metadata_keys = None
        self.meta_indices = None
        self.state = None
        self.has_batch_stats = False
        self._rng = jax.random.PRNGKey(seed)
        self._train_step = None
        self._eval_step_cache = {}
        self._warm_eval_shapes = set()
        self.mesh_ctx = None  # set via set_mesh for multi-chip data parallelism
        # optional adversarial-training components, persisted under the reference's
        # checkpoint keys (discriminator/optimizer_D/scheduler_D/steps — ref:
        # models/__init__.py:368-380, 445-456).  A GAN handler populates this dict
        # with 'params' / 'opt_state' / 'scheduler' / 'steps' pytrees; no model in the
        # reference zoo ships one, but the checkpoint contract round-trips them.
        self.gan_state = None
        self.device_degrade = False  # synthesize LR on device inside the train step
        self.eval_buckets = None  # pad eval shapes to multiples of this (see ops/masking)
        self._masked_eval_step = None
        self.int8_mode = False  # int8 serving fast path (set_int8)
        self.int8_residual_dtype = 'bfloat16'
        self._int8_ctx = None

    # --- module construction ------------------------------------------------------------
    def build_module(self, scale, dtype, **kwargs):
        raise NotImplementedError

    # --- metadata plumbing (QModel parity) ------------------------------------------------
    def set_metadata_keys(self, keys):
        """Precompute static selection indices from the dataset's metadata key list
        (ref: attention_manipulators/__init__.py:30-51 mask logic)."""
        self.metadata_keys = list(keys or [])
        meta_cfg = getattr(self, 'metadata', None)
        if not self.uses_metadata or meta_cfg is None:
            self.meta_indices = None
            return
        if 'all' in meta_cfg:
            mask = [True] * len(self.metadata_keys)
        else:
            mask = [k in meta_cfg for k in self.metadata_keys]
        if len(self.metadata_keys) == 1:
            mask = [True]
        new_indices = np.where(np.array(mask))[0]
        if self.meta_indices is None or not np.array_equal(new_indices,
                                                           self.meta_indices):
            # the indices are constant-folded into traced steps: drop any cached ones
            self._invalidate_steps()
        self.meta_indices = new_indices

    def _invalidate_steps(self):
        """Drop cached jitted steps (metadata indices / mode flags are trace-time
        constants, so any change requires a retrace)."""
        self._train_step = None
        self._multi_train_step = None
        self._eval_step_cache = {}
        self._warm_eval_shapes = set()
        self._masked_eval_step = None
        # int8 calibration bakes activation scales (and, for metadata styles, the
        # metadata width) under the CURRENT key selection — stale scales would
        # silently degrade or shape-mismatch after a re-key
        self._int8_ctx = None

    def set_device_degrade(self, enabled):
        if bool(enabled) != self.device_degrade:
            self.device_degrade = bool(enabled)
            self._invalidate_steps()

    def set_eval_buckets(self, multiple):
        """Enable bucketed eval: pad each eval image up to the next multiple of
        ``multiple`` per spatial axis and run one mask-exact compiled program per
        bucket instead of one per image shape (SURVEY §7 hard-part 2)."""
        if multiple and not self.bucketed_eval_ok:
            print('%s: bucketed eval is not exact for this architecture '
                  '(spatial softmax/covariance or strided pooling) — ignoring.'
                  % type(self).__name__)
            return
        self.eval_buckets = int(multiple) if multiple else None

    def set_int8(self, enabled=True, residual_dtype='bfloat16'):
        """Enable the int8 serving fast path (ops/quantization.py): per-channel int8
        weights, static absmax-calibrated activation scales (calibrated on the first
        eval batch with 10% margin), narrow residual carry.  v5e runs int8 convs at
        2x the bf16 MXU rate: measured 1.16-1.25x (EDSR) / 1.17x (RCAN) end-to-end
        at ~55 / ~40 dB fidelity vs the f32 forward.  Opt-in: metrics are computed
        on the quantized output."""
        if enabled and self.int8_family is None:
            print('%s: no int8 serving path for this architecture — ignoring.'
                  % type(self).__name__)
            return
        if enabled and self.int8_family in INT8_MEASURED_SLOWER:
            import warnings
            warnings.warn(
                'int8 measured SLOWER than bf16 for the %s family on v5e (%s; '
                'per-block modulation/attention breaks the int8 conv chain) — '
                'engaging anyway as requested. See README "int8 serving".'
                % (self.int8_family, INT8_MEASURED_SLOWER[self.int8_family]))
        self.int8_mode = bool(enabled)
        self.int8_residual_dtype = residual_dtype
        self._int8_ctx = None
        self._invalidate_steps()  # int8 is traced into cached (fused) eval steps

    def _int8_calibration_input(self, lr_f32, hr_hw=None):
        """Build the calibration input MATCHING what the int8 program consumes:
        interp-input families calibrate on the pre-upscaled (and y-channel)
        input, not the raw LR RGB (wrong channel count AND wrong statistics);
        tiled families calibrate on a tile-sized center crop — the tile grid
        exists precisely because the full-image forward does not fit, so an
        eager full-image calibration pass would OOM on large eval images."""
        from ..ops.colorspace import rgb_to_ycbcr_nhwc
        from ..ops.resize import resize_bicubic
        x = lr_f32
        if self.im_input == 'interp' and hr_hw is not None \
                and tuple(x.shape[1:3]) != tuple(hr_hw):
            x = resize_bicubic(x, int(hr_hw[0]), int(hr_hw[1]), dtype=jnp.float32)
        if self.colorspace == 'ycbcr' and x.shape[-1] == 3:
            x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
            x = rgb_to_ycbcr_nhwc(x, y_only=True, im_type='jpg')[..., :1]
        if self.tiled_eval:
            import math
            side = max(16, int(math.sqrt(self.max_combined_im_size)))
            h, w = x.shape[1:3]
            if h > side or w > side:
                hs = (h - min(h, side)) // 2
                ws = (w - min(w, side)) // 2
                x = x[:, hs:hs + min(h, side), ws:ws + min(w, side), :]
        return x

    def _int8_forward(self, batch):
        """Quantized forward; lazily quantizes weights + calibrates activation scales
        from the first batch seen, then reuses the jitted int8 program."""
        x = jnp.asarray(batch['lr'], jnp.float32)
        meta = self.prepare_metadata(x, batch.get('metadata')) \
            if self.uses_metadata else None
        self._ensure_int8_ctx(x, meta)
        fwd, qp = self._int8_ctx
        return fwd(qp, x, meta)

    def _ensure_int8_ctx(self, x, meta=None):
        """Quantize weights + calibrate activation scales on the first batch seen
        (host-side, OUTSIDE any trace — the resulting int8 program is pure).

        Every family's jitted program has the uniform signature ``fwd(qp, x, meta)``;
        metadata-free families ignore ``meta``.  ``meta`` is the handler-PREPARED
        vector (key-masked + scale_qpi-expanded where applicable)."""
        from ..ops import quantization as qz
        if self._int8_ctx is None:
            params = jax.tree.map(lambda a: np.asarray(a, np.float32),
                                  self.state.params)
            m = self.module
            rd = self.int8_residual_dtype
            if self.int8_family != 'edsr' and rd not in ('float32', 'bfloat16'):
                print("int8 %s: residual_dtype %r is EDSR-only (int16 grid) — "
                      "using bfloat16." % (self.int8_family, rd))
                rd = 'bfloat16'
            if self.int8_family == 'edsr':
                qp = qz.quantize_edsr_params(params)
                scales = qz.calibrate_edsr_scales(
                    params, [x], num_blocks=m.num_blocks, scale=self.scale,
                    res_scale=m.res_scale, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.edsr_int8_forward_static(
                    qp_, scales, xx, num_blocks=m.num_blocks, scale=self.scale,
                    res_scale=m.res_scale, residual_dtype=self.int8_residual_dtype))
            elif self.int8_family == 'rcan':
                qp = qz.quantize_rcan_params(params, m.n_resgroups, m.n_resblocks)
                scales = qz.calibrate_rcan_scales(params, [x], m.n_resgroups,
                                                  m.n_resblocks, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.rcan_int8_forward_static(
                    qp_, scales, xx, m.n_resgroups, m.n_resblocks,
                    residual_dtype=rd))
            elif self.int8_family == 'han':
                qp = qz.quantize_han_params(params, m.n_resgroups, m.n_resblocks)
                scales = qz.calibrate_han_scales(params, [x], m.n_resgroups,
                                                 m.n_resblocks, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.han_int8_forward_static(
                    qp_, scales, xx, m.n_resgroups, m.n_resblocks,
                    residual_dtype=rd))
            elif self.int8_family == 'sftmd':
                if meta is None:
                    raise RuntimeError('int8 SFTMD calibration needs a metadata '
                                       'batch alongside the first LR batch.')
                if getattr(self, 'channel_concat', False):
                    raise RuntimeError('int8 SFTMD does not support '
                                       'concat_strategy — disable --int8 or the '
                                       'concat strategy.')
                cfg = dict(num_blocks=m.num_blocks, scale=self.scale,
                           sft_type=m.sft_type, mask_para=m.mask_para,
                           repeats=m.repeats)
                qp = qz.quantize_sftmd_params(params, m.num_blocks, self.scale)
                scales = qz.calibrate_sftmd_scales(params, [x], [meta],
                                                   margin=1.1, **cfg)
                fwd = jax.jit(lambda qp_, xx, mm: qz.sftmd_int8_forward_static(
                    qp_, scales, xx, mm, **cfg))
            elif self.int8_family == 'srmd':
                if meta is None and self.uses_metadata:
                    raise RuntimeError('int8 SRMD calibration needs a metadata '
                                       'batch alongside the first LR batch.')
                x_cat = self.network_input(x, meta)
                qp = qz.quantize_srmd_params(params)
                scales = qz.calibrate_srmd_scales(params, [x_cat], self.scale,
                                                  margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.srmd_int8_forward_static(
                    qp_, scales, self.network_input(xx.astype(jnp.float32), mm),
                    self.scale))
            elif self.int8_family == 'vdsr':
                if getattr(m, 'padding', 'same') != 'same':
                    raise RuntimeError("int8 VDSR supports padding='same' only.")
                qp = qz.quantize_vdsr_params(params)
                scales = qz.calibrate_vdsr_scales(params, [x], margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.vdsr_int8_forward_static(
                    qp_, scales, xx))
            elif self.int8_family == 'san':
                qp = qz.quantize_san_params(params, m.n_resgroups, m.n_resblocks)
                scales = qz.calibrate_san_scales(params, [x], m.n_resgroups,
                                                 m.n_resblocks, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.san_int8_forward_static(
                    qp_, scales, xx, m.n_resgroups, m.n_resblocks,
                    residual_dtype=rd))
            elif self.int8_family == 'qsan':
                if meta is None:
                    raise RuntimeError('int8 QSAN calibration needs a metadata '
                                       'batch alongside the first LR batch.')
                qp = qz.quantize_qsan_params(params, m.n_resgroups, m.n_resblocks)
                scales = qz.calibrate_qsan_scales(
                    params, [x], [meta], n_resgroups=m.n_resgroups,
                    n_resblocks=m.n_resblocks, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.qsan_int8_forward_static(
                    qp_, scales, xx, mm, n_resgroups=m.n_resgroups,
                    n_resblocks=m.n_resblocks, residual_dtype=rd))
            elif self.int8_family == 'qhan':
                if meta is None:
                    raise RuntimeError('int8 QHAN calibration needs a metadata '
                                       'batch alongside the first LR batch.')
                qp = qz.quantize_qhan_params(params, m.n_resgroups, m.n_resblocks)
                scales = qz.calibrate_qhan_scales(
                    params, [x], [meta], n_resgroups=m.n_resgroups,
                    n_resblocks=m.n_resblocks, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.qhan_int8_forward_static(
                    qp_, scales, xx, mm, n_resgroups=m.n_resgroups,
                    n_resblocks=m.n_resblocks, residual_dtype=rd))
            elif self.int8_family == 'qedsr':
                if meta is None:
                    raise RuntimeError('int8 QEDSR calibration needs a metadata '
                                       'batch alongside the first LR batch.')
                cfg = dict(num_blocks=m.num_blocks, scale=self.scale,
                           res_scale=m.res_scale,
                           nonlinearity=m.q_layer_nonlinearity)
                qp = qz.quantize_qedsr_params(params, m.num_blocks)
                scales = qz.calibrate_qedsr_scales(params, [x], [meta],
                                                   margin=1.1, **cfg)
                fwd = jax.jit(lambda qp_, xx, mm: qz.qedsr_int8_forward_static(
                    qp_, scales, xx, mm, residual_dtype=rd, **cfg))
            elif self.int8_family == 'qrcan':
                if meta is None:
                    raise RuntimeError('int8 QRCAN calibration needs a metadata '
                                       'batch alongside the first LR batch.')
                qp = qz.quantize_qrcan_params(params, m.n_resgroups, m.n_resblocks)
                scales = qz.calibrate_qrcan_scales(
                    params, [x], [meta], style=m.style, n_resgroups=m.n_resgroups,
                    n_resblocks=m.n_resblocks, margin=1.1)
                fwd = jax.jit(lambda qp_, xx, mm: qz.qrcan_int8_forward_static(
                    qp_, scales, xx, mm, style=m.style, n_resgroups=m.n_resgroups,
                    n_resblocks=m.n_resblocks, residual_dtype=rd))
            else:
                raise RuntimeError('unknown int8 family %r' % self.int8_family)
            self._int8_ctx = (fwd, qp)

    def prepare_metadata(self, x, metadata):
        """Traced metadata prep: (B, M_total) -> model metadata input (or None)."""
        if not self.uses_metadata:
            return None
        if metadata is None:
            raise RuntimeError('Metadata needs to be specified for this network to run.')
        if self.meta_indices is not None and len(self.meta_indices) != metadata.shape[-1]:
            metadata = metadata[:, jnp.asarray(self.meta_indices)]
        return metadata.astype(x.dtype)

    def network_input(self, x, metadata):
        """Optionally concat metadata maps onto the input (ref: __init__.py:82-102)."""
        if self.channel_concat and metadata is not None:
            maps = jnp.broadcast_to(metadata[:, None, None, :],
                                    (x.shape[0], x.shape[1], x.shape[2],
                                     metadata.shape[-1]))
            return jnp.concatenate([x, maps.astype(x.dtype)], axis=-1)
        return x

    def _train_batch_keys(self):
        """Batch entries the train step consumes; in device-degradation mode the LR is
        synthesized on device from hr + blur_kernels (no 'lr' key)."""
        return ('hr', 'metadata', 'blur_kernels') if self.device_degrade \
            else ('lr', 'hr', 'metadata')

    def _prep_batch(self, batch):
        # uint8 transport (training analog of the fused-eval path): rgb-family
        # datasets may serve u8 crops — 4x less host->device tunnel traffic; the
        # /255 here is bit-identical to the host float conversion and fuses into
        # the first conv
        def as_f32(img):
            return img.astype(jnp.float32) / 255.0 if img is not None \
                and img.dtype == jnp.uint8 else img

        y = as_f32(batch.get('hr'))
        if self.device_degrade and batch.get('blur_kernels') is not None \
                and y is not None:
            # on-device online degradation: LR synthesized from the HR crop inside the
            # jitted step (one grouped blur conv + MXU bicubic for the whole batch)
            from ..ops.degradations import degrade_batch_on_device
            x, _, _ = degrade_batch_on_device(y, batch['blur_kernels'], None, self.scale)
        else:
            x = as_f32(batch['lr'])
        metadata = self.prepare_metadata(x, batch.get('metadata'))
        x = self.network_input(x, metadata)
        if self.channel_concat:
            metadata = None  # consumed by the concat; module takes no metadata arg
        return x, y, metadata

    # --- state management -----------------------------------------------------------------
    @property
    def module_input_channels(self):
        extra = getattr(self, 'num_metadata', 0) if self.channel_concat else 0
        return self.in_channels + extra

    @property
    def module_takes_metadata(self):
        return self.uses_metadata and not self.channel_concat

    def init_state(self, spatial=(16, 16), batch=1):
        """Initialize parameters (lazily, once shapes/metadata keys are known)."""
        x = jnp.zeros((batch,) + tuple(spatial) + (self.module_input_channels,), self.dtype)
        kwargs = {}
        if self.module_takes_metadata:
            n_meta = getattr(self, 'num_metadata', 1)
            kwargs['metadata'] = jnp.zeros((batch, self._metadata_width(n_meta)),
                                           self.dtype)
        variables = self.module.init(self._rng, x, **kwargs)
        self.has_batch_stats = 'batch_stats' in variables
        self.state = TrainState.create(self.module.apply, variables['params'], self.tx,
                                       batch_stats=variables.get('batch_stats'))
        if self.mesh_ctx is not None:
            self.state = self.mesh_ctx.replicate(self.state)
        return self.state

    def _metadata_width(self, n_meta):
        return n_meta

    # --- train / eval ----------------------------------------------------------------------
    def run_train(self, **batch):
        """One training step (ref BaseModel.run_train, models/__init__.py:466-489)."""
        if self.eval_mode:
            raise RuntimeError('Model initialized in eval mode, training not possible.')
        shard_factor = int(batch.pop('_shard_factor', 1) or 1)
        if shard_factor > 1 and self.mesh_ctx is None:
            raise RuntimeError('Received a process-local batch shard (multihost input '
                               'sharding) but no device mesh is set — multi-process '
                               'launches require gpu="multi".')
        ragged_probe = batch['hr'] if self.device_degrade else batch['lr']
        if isinstance(ragged_probe, (list, tuple)):
            raise RuntimeError('Training batch contains differently-sized images — use a '
                               'fixed crop (data "crop" option, which must be no larger '
                               'than the smallest LR image) or batch_size=1 so XLA '
                               'sees static shapes.')
        if self.state is None:
            spatial = batch['lr'].shape[1:3] if not self.device_degrade else \
                (batch['hr'].shape[1] // self.scale, batch['hr'].shape[2] // self.scale)
            self.init_state(spatial=spatial)  # replicates over the mesh if one is set
        if self._train_step is None:
            self._train_step = make_train_step(self.loss_fn, self._prep_batch,
                                               self.has_batch_stats)
        dev_batch = {k: batch[k] for k in self._train_batch_keys()
                     if k in batch and batch[k] is not None}
        if self.mesh_ctx is not None:
            dev_batch = self.mesh_ctx.shard_batch(dev_batch, shard_factor=shard_factor)
        self.state, loss = self._train_step(self.state, dev_batch)
        return loss, None

    def run_train_multi(self, batches):
        """Run K optimizer steps in ONE device dispatch (lax.scan over stacked batches).

        :param batches: list of K batch dicts with identically-shaped 'lr'/'hr'
            (/'metadata') arrays, OR a pre-stacked dict of (K, B, ...) arrays
            (possibly already on device — see TrainingHandler's staged uploader).
        :return: device array of the K losses, dispatched asynchronously — the caller
            decides when to realize it (forcing a sync here would serialize every
            dispatch behind a device round-trip, which dominates on remote chips).
        """
        from ..training.state import make_multi_train_step
        if self.eval_mode:
            raise RuntimeError('Model initialized in eval mode, training not possible.')
        pre_stacked = isinstance(batches, dict)
        if pre_stacked:
            shard_factor = int(batches.get('_shard_factor', 1) or 1)
            keys = [k for k in self._train_batch_keys()
                    if k in batches and batches[k] is not None]
            stacked = {k: batches[k] for k in keys}
            ref_spatial = stacked['hr' if self.device_degrade else 'lr'].shape[2:4]
        else:
            shard_factor = int(batches[0].get('_shard_factor', 1) or 1)
            keys = [k for k in self._train_batch_keys()
                    if k in batches[0] and batches[0][k] is not None]
            stacked = {k: np.stack([np.asarray(b[k]) for b in batches], axis=0)
                       for k in keys}
            ref_spatial = batches[0]['hr' if self.device_degrade else 'lr'].shape[1:3]
        if shard_factor > 1 and self.mesh_ctx is None:
            raise RuntimeError('Received process-local batch shards (multihost input '
                               'sharding) but no device mesh is set — multi-process '
                               'launches require gpu="multi".')
        if self.state is None:
            spatial = ref_spatial if not self.device_degrade else \
                (ref_spatial[0] // self.scale, ref_spatial[1] // self.scale)
            self.init_state(spatial=spatial)  # replicates over the mesh if one is set
        if getattr(self, '_multi_train_step', None) is None:
            self._multi_train_step = make_multi_train_step(self.loss_fn,
                                                           self._prep_batch,
                                                           self.has_batch_stats)
        if self.mesh_ctx is not None:
            # shard each step's batch axis (leaves are (K, B, ...), batch on axis 1):
            # sharded put, process-local global assembly under multihost input
            # sharding, unsharded-put fallback when the batch doesn't divide the
            # mesh — all one rule with the single-step path (MeshContext.shard_batch)
            stacked = self.mesh_ctx.shard_batch(stacked, shard_factor=shard_factor,
                                                stacked_steps=True)
        self.state, losses = self._multi_train_step(self.state, stacked)
        return losses

    def _eval_step_for(self, shape):
        key = tuple(shape)
        if key not in self._eval_step_cache:
            self._eval_step_cache[key] = make_eval_step(self.loss_fn, self._prep_batch,
                                                        self.has_batch_stats)
        return self._eval_step_cache[key]

    def run_eval(self, x, y=None, request_loss=False, metadata=None, timing=False,
                 **kwargs):
        """Jitted eval (ref BaseModel.run_eval, models/__init__.py:492-522).

        Returns (sr NHWC numpy float32, loss or None, runtime seconds or None).
        """
        if self.state is None:
            self.init_state(spatial=x.shape[1:3])
        batch = {'lr': jnp.asarray(x, self.dtype)}
        if metadata is not None:
            batch['metadata'] = jnp.asarray(metadata)
        if y is not None and request_loss:
            batch['hr'] = jnp.asarray(y, self.dtype)
        if self.mesh_ctx is not None and not self.tiled_eval:
            # data-parallel eval: split the batch across chips when it divides evenly
            # (bs=1 stays whole; tiled models shard their tile batch instead)
            batch = self.mesh_ctx.shard_batch(batch)

        if self.tiled_eval and self.int8_mode and self._int8_ctx is None:
            # calibrate BEFORE the tiled dispatch (the tile grid then runs the
            # quantized program per tile) — on a tile-sized crop, never the
            # full image (see _int8_calibration_input)
            xf = jnp.asarray(x)
            xf = xf.astype(jnp.float32) / 255.0 if xf.dtype == jnp.uint8 \
                else xf.astype(jnp.float32)
            xf = self._int8_calibration_input(xf)
            meta_cal = self.prepare_metadata(xf, batch.get('metadata')) \
                if self.uses_metadata else None
            self._ensure_int8_ctx(xf, meta_cal)
        fwd = self._tiled_forward if self.tiled_eval else \
            self._int8_forward if self.int8_mode else \
            self._bucketed_forward if self.eval_buckets else None
        if fwd is not None:
            warm_key = (('tiled' if self.tiled_eval else
                         'int8' if self.int8_mode else 'buckets'), tuple(x.shape))
            if timing and warm_key not in self._warm_eval_shapes:
                # exclude compile from timing, once per (path, shape) — rerunning
                # the forward on EVERY timed call doubled timed-eval wall-clock
                jax.block_until_ready(fwd(batch))
                self._warm_eval_shapes.add(warm_key)
            tic = time.perf_counter() if timing else None
            out = fwd(batch)
            runtime = None
            if timing:
                out.block_until_ready()  # model compute only: loss realizes after
                runtime = time.perf_counter() - tic
            loss = None
            if request_loss and y is not None:
                loss = float(self.loss_fn(out, batch['hr']))
            return np.asarray(out, np.float32), loss, runtime

        warm = tuple(x.shape) in self._warm_eval_shapes
        step = self._eval_step_for(x.shape)
        if timing and not warm:
            step(self.state, batch)[0].block_until_ready()  # exclude compile from timing
        tic = time.perf_counter() if timing else None
        out, loss = step(self.state, batch)
        if timing:
            out.block_until_ready()
            runtime = time.perf_counter() - tic
        else:
            runtime = None
        self._warm_eval_shapes.add(tuple(x.shape))
        loss_out = float(loss) if (request_loss and y is not None) else None
        return np.asarray(out, np.float32), loss_out, runtime

    def _tile_step(self, state, tb):
        """One forward over a (tile-)batch inside the tiled eval: the calibrated
        int8 program when int8 serving is on (calibration happened outside any
        trace), else the standard jitted eval step."""
        if self.int8_mode and self._int8_ctx is not None:
            fwd_q, qp = self._int8_ctx
            xq = tb['lr']
            xq = xq.astype(jnp.float32) / 255.0 if xq.dtype == jnp.uint8 \
                else xq.astype(jnp.float32)
            meta_in = self.prepare_metadata(xq, tb.get('metadata')) \
                if self.uses_metadata else None
            return fwd_q(qp, xq, meta_in)
        return self._eval_step_for(tb['lr'].shape)(state, tb)[0]

    def _tiled_forward(self, batch, shave=10, state=None):
        """Static-shape tile-grid eval replacing the reference's recursive forward_chop
        (ref: advanced/handlers.py:80-129).

        Pads the LR image to a uniform grid of overlapping tiles whose area stays under
        ``max_combined_im_size``, runs the network on the tile batch (one compile per tile
        shape), and stitches the centers.  TPU-native: one batched static-shape call
        instead of data-dependent recursion.
        """
        state = self.state if state is None else state
        x = batch['lr']
        n, h, w, c = x.shape
        # choose the number of halvings like the reference's recursion depth
        level = 0
        while (h // (2 ** level) + shave) * (w // (2 ** level) + shave) \
                >= self.max_combined_im_size:
            level += 1
        if level == 0:
            return self._tile_step(state, batch)

        grid = 2 ** level
        tile_h, tile_w = -(-h // grid), -(-w // grid)
        span_h, span_w = tile_h + 2 * shave, tile_w + 2 * shave
        while grid > 1 and (span_h > h or span_w > w):  # image too small for this depth
            grid //= 2
            tile_h, tile_w = -(-h // grid), -(-w // grid)
            span_h, span_w = tile_h + 2 * shave, tile_w + 2 * shave
        if grid == 1:
            return self._tile_step(state, batch)

        # tiles carry `shave` halo on each side; anchors are clamped inside the image so
        # border tiles see the exact image edge (same zero-pad context as the untiled
        # model) — like the reference chop's corner-anchored quadrants
        # (advanced/handlers.py:86-91)
        anchors = []
        tiles = []
        for i in range(grid):
            for j in range(grid):
                src_i = min(max(i * tile_h - shave, 0), h - span_h)
                src_j = min(max(j * tile_w - shave, 0), w - span_w)
                anchors.append((i * tile_h - src_i, j * tile_w - src_j))
                tiles.append(x[:, src_i:src_i + span_h, src_j:src_j + span_w, :])
        tiles = jnp.concatenate(tiles, axis=0)
        tile_batch = {'lr': tiles}
        if 'metadata' in batch:
            tile_batch['metadata'] = jnp.tile(batch['metadata'], (grid * grid, 1))
        n_tiles_total = tiles.shape[0]
        if self.mesh_ctx is not None:
            # context-parallel eval: pad the tile batch to the mesh size and shard
            # the tiles across chips.  Trace-safe (pad counts are shape-derived
            # Python ints; the reshard is a sharding constraint), so the tile
            # scatter composes into the fused eval program — under jit XLA places
            # the constraint, eagerly it acts like a device_put reshard.
            nd = self.mesh_ctx.n_devices
            pad = (-n_tiles_total) % nd
            for k, v in tile_batch.items():
                if pad:
                    v = jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)], axis=0)
                tile_batch[k] = jax.lax.with_sharding_constraint(
                    v, self.mesh_ctx.batch_sharding)
        sr_tiles = self._tile_step(state, tile_batch)
        sr_tiles = sr_tiles[:n_tiles_total]

        s = self.scale
        out = jnp.zeros((n, grid * tile_h * s, grid * tile_w * s, c), sr_tiles.dtype)
        idx = 0
        for i in range(grid):
            for j in range(grid):
                off_i, off_j = anchors[idx]
                tile = sr_tiles[idx * n:(idx + 1) * n,
                                off_i * s:(off_i + tile_h) * s,
                                off_j * s:(off_j + tile_w) * s, :]
                out = jax.lax.dynamic_update_slice(
                    out, tile, (0, i * tile_h * s, j * tile_w * s, 0))
                idx += 1
        return out[:, :h * s, :w * s, :]

    def supports_fused_eval(self):
        """Fused device eval covers every family mode: rgb/unmodified (edsr...),
        metadata models (augmented_rgb: qrcan/srmd/...), pre-upscaled interp inputs
        (sparnet), y-channel ycbcr models (srcnn/vdsr) and the tiled eval (san) —
        the tile grid traces into the same program, including mesh-sharded tiles
        (the tile scatter is trace-safe: pad counts are shape-derived constants and
        the reshard is a sharding constraint).  Bucketed eval keeps its dedicated
        path.  int8 serving composes with the fused step for the families that have
        an int8 program (edsr/rcan/qrcan)."""
        # (int8_mode implies int8_family is set — set_int8 refuses otherwise)
        return (not self.eval_buckets
                and self.colorspace in ('rgb', 'augmented_rgb', 'ycbcr'))

    def run_eval_fused(self, batch, metrics=('PSNR', 'SSIM'), timing=False,
                       include_lr=True, request_loss=False):
        """TPU-native eval fast path: ONE device program runs forward + bicubic LR
        baseline + YCbCr + PSNR/SSIM, and only per-image scalars return to the host.

        Avoids the SR-image device->host round trip and the per-metric re-uploads,
        which dominate eval wall-clock on remote-attached chips.  LR/HR travel as
        uint8 when that is lossless (file-decoded images), f32 otherwise.  The LR
        baseline uses the MXU bicubic (same filter weights as PIL, |err| <= 1 uint8
        LSB from fixed-point rounding — see ops/resize.resize_bicubic).

        Without ``timing``, the returned metric matrix is ONE UNREALIZED (K, N) device
        array (jax async dispatch): the host never blocks here, so decode/upload of the
        next batch overlaps device compute and the whole batch's metrics come back in a
        single tunnel round trip — realize with ``np.asarray`` when collecting.

        :return: ((keys, values): keys a K-tuple like ('LR>PSNR', 'model>PSNR', ...)
            and values the matching (K, N) device array, runtime).  With
            ``include_lr=False`` the LR-baseline rows are omitted entirely (the eval
            protocol computes them once, on the first model only).  With
            ``request_loss`` a final 'model>loss' row carries the batch-mean criterion
            (replicated per image; the same loss_fn the standard eval step uses) —
            this powers the fused training-time validation epoch.
        """
        sides = ('LR', 'model') if include_lr else ('model',)
        keys = tuple('%s>%s' % (side, met) for met in metrics for side in sides)
        if request_loss:
            keys = keys + ('model>loss',)
        if isinstance(batch['lr'], (list, tuple)) or \
                getattr(batch['lr'], 'dtype', None) == object:
            # ragged batch (mixed-size eval images at bs>1): run per image, using
            # only the entries the fused path consumes (lr/hr/metadata)
            meta = batch.get('metadata')
            parts, total = [], 0.0
            for i in range(len(batch['lr'])):
                one = {'lr': np.asarray(batch['lr'][i])[None],
                       'hr': np.asarray(batch['hr'][i])[None],
                       'metadata': None if meta is None else meta[i:i + 1]}
                (_, vals), rt = self.run_eval_fused(one, metrics=metrics,
                                                    timing=timing,
                                                    include_lr=include_lr,
                                                    request_loss=request_loss)
                parts.append(vals)
                total += rt or 0.0
            return (keys, jnp.concatenate(parts, axis=1)), \
                (total if timing else None)

        def as_u8_if_lossless(img):
            if isinstance(img, jax.Array):
                # already on device (device_prefetch/device_collate): converting
                # here would DOWNLOAD the batch just to re-upload it — the u8
                # transport saving only applies to host-resident arrays
                return img
            if getattr(img, 'dtype', None) == np.uint8:
                return img  # dataset keep_uint8 passthrough: zero host work here
            img = np.asarray(img, np.float32)
            u8 = np.rint(img * 255).astype(np.uint8)
            return u8 if np.abs(u8.astype(np.float32) / 255.0 - img).max() <= 1e-6 \
                else img  # uint8: 4x less tunnel traffic, /255 redone on device

        lr = as_u8_if_lossless(batch['lr'])
        if self.state is None:
            self.init_state(spatial=lr.shape[1:3])
        dev_batch = {'lr': jnp.asarray(lr),
                     'hr': jnp.asarray(as_u8_if_lossless(batch['hr']))}
        if batch.get('metadata') is not None and self.uses_metadata:
            meta = batch['metadata']
            if isinstance(meta, jax.Array):
                # already uploaded (device_prefetch): np.asarray here would pay a
                # full download round trip per batch just to re-upload
                dev_batch['metadata'] = meta.astype(jnp.float32) \
                    if meta.dtype != jnp.float32 else meta
            else:
                dev_batch['metadata'] = jnp.asarray(np.asarray(meta, np.float32))
        if self.mesh_ctx is not None:
            # multi-chip fused eval: batch sharded over the data axis (when it
            # divides evenly), metrics computed per shard and gathered
            dev_batch = self.mesh_ctx.shard_batch(dev_batch)
        if self.int8_mode and self._int8_ctx is None:
            lr_f32 = lr.astype(np.float32) / 255.0 if lr.dtype == np.uint8 \
                else np.asarray(lr, np.float32)
            # the calibration input must match the int8 program's input (interp
            # upscale / y-channel for interp families; tile-sized crop for tiled
            # families), not the raw LR RGB
            x_cal = self._int8_calibration_input(
                jnp.asarray(lr_f32), hr_hw=dev_batch['hr'].shape[1:3])
            meta_cal = self.prepare_metadata(x_cal, dev_batch.get('metadata')) \
                if self.uses_metadata else None
            self._ensure_int8_ctx(x_cal, meta_cal)  # calibrate OUTSIDE the trace
        key = ('fused', tuple(metrics), include_lr, self.int8_mode, request_loss)
        if key not in self._eval_step_cache:
            self._eval_step_cache[key] = self._make_fused_step(tuple(metrics),
                                                               include_lr,
                                                               request_loss)
        step = self._eval_step_cache[key]
        runtime = None
        if timing:
            # timing inherently serializes per batch; exclude compile like run_eval
            # by warming once per (program, shape), not re-running on every batch
            warm_key = key + (tuple(lr.shape),)
            if warm_key not in self._warm_eval_shapes:
                jax.block_until_ready(step(self.state, dev_batch))
                self._warm_eval_shapes.add(warm_key)
            tic = time.perf_counter()
            out = step(self.state, dev_batch)
            jax.block_until_ready(out)
            runtime = time.perf_counter() - tic
        else:
            out = step(self.state, dev_batch)  # async dispatch: never blocks the host
        return (keys, out), runtime

    def _make_fused_step(self, metrics, include_lr=True, request_loss=False):
        from ..ops.colorspace import rgb_to_ycbcr_nhwc
        from ..ops.resize import resize_bicubic
        from ..ops.metrics import psnr_nhw, ssim_nhw
        fns = {'PSNR': lambda a, b: psnr_nhw(a, b, 1.0),
               'SSIM': lambda a, b: ssim_nhw(a, b, 1.0)}

        def step(state, batch):
            hr, lr = batch['hr'], batch['lr']
            if hr.dtype == jnp.uint8:
                hr = hr.astype(jnp.float32) / 255.0
            if lr.dtype == jnp.uint8:
                lr = lr.astype(jnp.float32) / 255.0

            def prep_y(img):  # mirrors EvalHub._high_res_prep: clip + Y ('jpg')
                img = jnp.clip(img.astype(jnp.float32), 0.0, 1.0)
                return rgb_to_ycbcr_nhwc(img, y_only=True, im_type='jpg')[..., 0]

            hr_y = prep_y(hr)
            need_interp = include_lr or self.im_input == 'interp'
            interp = lr_y = None
            if need_interp:
                # device bicubic stands in for the host PIL prep (same filter
                # weights; <=1 uint8 LSB fixed-point difference)
                interp = resize_bicubic(lr, hr.shape[1], hr.shape[2],
                                        dtype=jnp.float32)
                lr_y = prep_y(interp)

            if self.im_input == 'interp':
                # pre-upscaled pipeline: ycbcr models consume the Y channel of the
                # upscaled LR (ref eval feeds lr_prep[..., :1]); rgb models the image
                x_in = lr_y[..., None] if self.colorspace == 'ycbcr' else interp
            else:
                x_in = lr

            if self.tiled_eval:
                # the static tile grid traces into this same program (anchors are
                # shape-derived constants); the inner step is inlined — the
                # calibrated int8 program when int8 serving is on (handled by
                # _tile_step), else the standard jitted eval step
                tb = {'lr': x_in}
                if batch.get('metadata') is not None:
                    tb['metadata'] = batch['metadata']
                sr = self._tiled_forward(tb, state=state)
            elif self.int8_mode:
                # calibrated int8 serving program, inlined into the fused step
                # (int8 convs at 2x the bf16 MXU rate; quantized params are trace
                # constants, refreshed via set_int8/_invalidate_steps)
                fwd, qp = self._int8_ctx
                meta_in = self.prepare_metadata(x_in, batch.get('metadata')) \
                    if self.uses_metadata else None
                sr = fwd(qp, x_in.astype(jnp.float32), meta_in)
            else:
                x, _, metadata = self._prep_batch({**batch, 'hr': hr, 'lr': x_in})
                kwargs = {}
                if metadata is not None:
                    kwargs['metadata'] = metadata
                variables = {'params': state.params}
                if self.has_batch_stats:
                    variables['batch_stats'] = state.batch_stats
                    kwargs['train'] = False
                sr = state.apply_fn(variables, x, **kwargs)

            if self.colorspace == 'ycbcr':  # model emits Y directly
                sr_y = jnp.clip(sr[..., 0].astype(jnp.float32), 0.0, 1.0)
            else:
                sr_y = prep_y(sr)
            rows = []
            for met in metrics:  # row order matches run_eval_fused's keys tuple
                if include_lr:
                    rows.append(fns[met](lr_y, hr_y))
                rows.append(fns[met](sr_y, hr_y))
            if request_loss:
                # batch-mean criterion against the model-space target — identical to
                # the standard eval step's loss (make_eval_step: loss_fn(out, y)),
                # replicated per image to keep the (K, N) matrix rectangular
                target = hr_y[..., None] if self.colorspace == 'ycbcr' else hr
                loss = self.loss_fn(sr, target)
                rows.append(jnp.broadcast_to(loss.astype(jnp.float32),
                                             (hr.shape[0],)))
            return jnp.stack(rows)  # (K, N): one host round trip for the whole batch

        return jax.jit(step)

    def _bucketed_forward(self, batch):
        """Zero-pad the LR batch to the bucket grid, run the mask-exact padded step,
        slice the SR output back to the true size.  One XLA program per bucket shape
        (jit retrace), regardless of how many distinct image sizes the eval set has."""
        x = batch['lr']
        n, h, w, c = x.shape
        m = self.eval_buckets
        bh, bw = -(-h // m) * m, -(-w // m) * m
        padded = {'lr': jnp.pad(x, ((0, 0), (0, bh - h), (0, bw - w), (0, 0))),
                  'valid_hw': jnp.asarray([h, w], jnp.int32)}
        if batch.get('metadata') is not None:
            padded['metadata'] = batch['metadata']
        if self._masked_eval_step is None:
            self._masked_eval_step = make_masked_eval_step(self._prep_batch,
                                                           self.has_batch_stats)
        out = self._masked_eval_step(self.state, padded)
        factor = out.shape[1] // bh
        return out[:, :h * factor, :w * factor, :]

    # --- checkpointing (ref: models/__init__.py:349-464) -----------------------------------
    def save_model(self, model_save_name, model_idx, model_save_dir):
        state_dict = {
            'network': serialization.to_state_dict(self.state.params),
            'optimizer': serialization.to_state_dict(self.state.opt_state),
            'batch_stats': serialization.to_state_dict(self.state.batch_stats)
            if self.state.batch_stats is not None else {},
            'step': np.asarray(self.state.step),
            'model_name': self.model_name,
            'model_epoch': int(self.curr_epoch),
        }
        if self.gan_state:  # optional GAN entries (ref: models/__init__.py:368-380)
            for ours, ref_key in _GAN_STATE_KEYS:
                if ours in self.gan_state:
                    state_dict[ref_key] = serialization.to_state_dict(
                        self.gan_state[ours])
        path = os.path.join(model_save_dir, '%s_%s' % (model_save_name, model_idx))
        from ..utils import async_ckpt
        import jax.numpy as jnp
        narrow = self.checkpoint_dtype == 'bf16_moments' and not self.eval_mode
        if self.async_checkpoint and not self.eval_mode:
            # fresh on-device buffers: the next epoch's donated train step would
            # otherwise delete these arrays under the background writer.  The
            # bf16_moments narrowing happens inside the same program (a cast
            # already yields fresh buffers — copying it again would be waste)
            state_dict = async_ckpt.snapshot_device(
                state_dict,
                narrow_keys=('optimizer',) if narrow else (),
                narrow_dtype=jnp.bfloat16 if narrow else None)
        elif narrow:  # synchronous save: cast only, no donation hazard to copy for
            state_dict['optimizer'] = async_ckpt.cast_float_leaves(
                state_dict['optimizer'], jnp.bfloat16)
        # parallel device->host copies for ALL leaves up front: serialization used to
        # fetch leaf-by-leaf, paying one tunnel round-trip per tensor
        state_dict = async_ckpt.start_fetch(state_dict)

        if self.checkpoint_backend == 'orbax':
            from ..utils.orbax_ckpt import save_orbax

            def job(sd=state_dict, p=path):
                save_orbax(p, async_ckpt.realize(sd))
        else:
            def job(sd=state_dict, p=path):
                if os.path.isdir(p):
                    # overwriting an epoch previously saved with the orbax backend
                    import shutil
                    shutil.rmtree(p)
                payload = serialization.msgpack_serialize(async_ckpt.realize(sd))
                async_ckpt.atomic_write_bytes(p, payload)
        if not self.async_checkpoint:
            job()
            return
        async_ckpt.WRITER.submit(path, job)

    def wait_pending_checkpoints(self, timeout=None):
        """Fence: block until every background checkpoint write is on disk (and
        re-raise the first failure).  Call before reading or deleting checkpoint
        files.  No-op when nothing is queued.  Fences the PROCESS-global writer:
        checkpoints are often loaded through a different handler object than the
        one that saved them.  ``timeout`` bounds the drain (failure paths)."""
        from ..utils import async_ckpt
        async_ckpt.WRITER.wait(timeout=timeout)

    def pending_checkpoint_paths(self):
        from ..utils import async_ckpt
        return async_ckpt.WRITER.pending_paths

    def load_model(self, model_save_name, model_idx, model_save_dir, load_override=None,
                   preloaded_state=None):
        # NB: the reference's `legacy` flag (its torch state_dict key-remapping,
        # models/__init__.py:411-464) has no equivalent here — reference checkpoints
        # enter through convert_weights, which performs the legacy key rewriting.
        load_dir = load_override or model_save_dir
        self.wait_pending_checkpoints()  # a just-saved epoch may still be in flight
        path = os.path.join(load_dir, '%s_%s' % (model_save_name, model_idx))
        if preloaded_state is not None:
            state_dict = preloaded_state
        elif os.path.isdir(path):  # orbax directory checkpoint (format auto-detect)
            from ..utils.orbax_ckpt import restore_orbax
            state_dict = restore_orbax(path)
        else:
            with open(path, 'rb') as f:
                state_dict = serialization.msgpack_restore(f.read())
        if self.state is None:
            self.init_state()
        params = serialization.from_state_dict(self.state.params, state_dict['network'])
        batch_stats = self.state.batch_stats
        if batch_stats is not None and state_dict.get('batch_stats'):
            batch_stats = serialization.from_state_dict(batch_stats,
                                                        state_dict['batch_stats'])
        if self.eval_mode:
            self.state = self.state.replace(params=params, batch_stats=batch_stats,
                                            step=jnp.asarray(state_dict['step']))
        else:
            opt_state = serialization.from_state_dict(self.state.opt_state,
                                                      state_dict['optimizer'])
            # a 'bf16_moments' checkpoint restores narrow leaves: cast back to the
            # live optimizer template's dtypes or the first donated train step
            # retraces and carries bf16 moments for the rest of the run
            from ..utils.async_ckpt import cast_to_template_dtypes
            opt_state = cast_to_template_dtypes(self.state.opt_state, opt_state)
            self.state = self.state.replace(params=params, opt_state=opt_state,
                                            batch_stats=batch_stats,
                                            step=jnp.asarray(state_dict['step']))
        # from_state_dict restores HOST numpy leaves (topology-portable by
        # construction: orbax/msgpack checkpoints carry no sharding metadata, so a
        # run saved on an 8-device mesh restores on 1 chip and vice versa); commit
        # them to the accelerator once — replicated over the mesh when one is set —
        # or every subsequent jitted call re-uploads the full parameter set
        # (60 MB/step for RCAN-sized models on a remote-attached chip)
        if self.mesh_ctx is not None:
            self.state = self.mesh_ctx.replicate(self.state)
        else:
            self.state = jax.device_put(self.state)
        if self._int8_ctx is not None or self.int8_mode:
            # int8 quantized weights are derived from (now-replaced) params and baked
            # as trace constants — drop them so the next call requantizes/recompiles
            self._int8_ctx = None
            self._eval_step_cache = {}
        if not self.eval_mode and self.gan_state is not None:
            # optional GAN entries restore into the handler's templates, mirroring the
            # reference's hasattr-guarded loads (ref: models/__init__.py:445-456)
            for ours, ref_key in _GAN_STATE_KEYS:
                if ref_key in state_dict and ours in self.gan_state:
                    self.gan_state[ours] = serialization.from_state_dict(
                        self.gan_state[ours], state_dict[ref_key])
        self.set_epoch(int(state_dict['model_epoch']))
        print('Loaded model uses the following architecture:', state_dict['model_name'])
        return state_dict

    def run_forensic(self, x, metadata=None, **kwargs):
        """Forward pass that also returns the attention introspection data
        (ref BaseModel.run_forensic, models/__init__.py:524-529).

        Returns (output NHWC numpy, intermediates dict keyed by module path: channel /
        meta / pixel attention vectors sown by the attention layers).
        """
        if self.state is None:
            self.init_state(spatial=x.shape[1:3])
        batch = {'lr': jnp.asarray(x, self.dtype)}
        if metadata is not None:
            batch['metadata'] = jnp.asarray(metadata)
        xin, _, meta = self._prep_batch(batch)
        variables = {'params': self.state.params}
        if self.state.batch_stats is not None:
            variables['batch_stats'] = self.state.batch_stats
        call_kwargs = {} if meta is None else {'metadata': meta}
        out, aux = self.module.apply(variables, xin, mutable=['intermediates'],
                                     **call_kwargs)
        forensic = jax.tree.map(np.asarray, aux.get('intermediates', {}))
        return np.asarray(out, np.float32), forensic

    # --- parallelism ------------------------------------------------------------------------
    def set_mesh(self, mesh_ctx):
        """Enable data-parallel execution over a device mesh (the TPU-native replacement
        for the reference's set_multi_gpu/nn.DataParallel, models/__init__.py:344-347)."""
        self.mesh_ctx = mesh_ctx
        if self.state is not None:
            self.state = mesh_ctx.replicate(self.state)

    # --- misc (ref BaseModel misc hooks) ----------------------------------------------------
    def set_epoch(self, epoch):
        self.curr_epoch = epoch

    def get_learning_rate(self):
        step = int(self.state.step) if self.state is not None else 0
        return float(self.schedule(step))

    def print_parameters(self, verbose=False):
        if self.state is None:
            self.init_state()
        total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params))
        if verbose:
            print('Total number of trainable parameters:', total)
        return total

    def epoch_end_calls(self):
        pass

    def extra_diagnostics(self):
        pass

    def pre_training_model_load(self):
        pass


class QHandler(BaseHandler):
    """Metadata bookkeeping shared by all meta-models (ref QModel,
    attention_manipulators/__init__.py:6-27)."""

    uses_metadata = True

    def __init__(self, metadata=None, **kwargs):
        if metadata is not None:
            self.num_metadata = len(metadata)
            if 'all' in metadata:
                self.num_metadata += 39  # all celeba attributes
            if 'blur_kernel' in metadata:
                self.num_metadata += 9
            elif 'unmodified_blur_kernel' in metadata:
                self.num_metadata += 440
            self.metadata = metadata
        else:
            self.metadata = ['qpi']
            self.num_metadata = 1
        super().__init__(**kwargs)


# ----------------------------------- concrete handlers -----------------------------------
@register_model('srcnn')
class SRCNNHandler(BaseHandler):
    """(ref: basic/handlers.py:6-17)"""
    colorspace = 'ycbcr'
    im_input = 'interp'
    loss_type = 'mse'
    in_channels = 1

    def build_module(self, scale, dtype, kernel_pattern=None, channel_pattern=None,
                     padding='same', **kwargs):
        return basic.SRCNN(kernel_pattern=kernel_pattern, channel_pattern=channel_pattern,
                           padding=padding or 'same', dtype=dtype)


@register_model('vdsr')
class VDSRHandler(BaseHandler):
    """(ref: basic/handlers.py:20-35) — grad_clip 0.1 default."""
    colorspace = 'ycbcr'
    im_input = 'interp'
    loss_type = 'mse'
    grad_clip = 0.1
    in_channels = 1
    int8_family = 'vdsr'  # full-HR-resolution conv chain: conv-heaviest per pixel

    def build_module(self, scale, dtype, kernel_pattern=None, channel_pattern=None,
                     padding='same', **kwargs):
        return basic.VDSR(kernel_pattern=kernel_pattern, channel_pattern=channel_pattern,
                          padding=padding or 'same', dtype=dtype)


@register_model('edsr')
class EDSRHandler(BaseHandler):
    """(ref: advanced/handlers.py:7-23)"""
    int8_family = 'edsr'

    def build_module(self, scale, dtype, in_features=3, num_features=64, num_blocks=16,
                     res_scale=0.1, **kwargs):
        self.in_channels = in_features or 3
        return advanced.EDSR(net_features=num_features or 64, num_blocks=num_blocks or 16,
                             scale=scale, res_scale=res_scale if res_scale is not None
                             else 0.1, in_features=self.in_channels, dtype=dtype)


@register_model('rcan')
class RCANHandler(BaseHandler):
    """(ref: advanced/handlers.py:26-39).  The reference locks the size parameters;
    we accept them as an optional superset (defaults identical)."""
    int8_family = 'rcan'

    def build_module(self, scale, dtype, in_features=3, n_resblocks=20, n_resgroups=10,
                     n_feats=64, reduction=16, **kwargs):
        self.in_channels = in_features or 3
        return advanced.RCAN(scale=scale, in_feats=self.in_channels,
                             n_resblocks=n_resblocks or 20, n_resgroups=n_resgroups or 10,
                             n_feats=n_feats or 64, reduction=reduction or 16,
                             dtype=dtype)


@register_model('han')
class HANHandler(BaseHandler):
    """(ref: advanced/handlers.py:42-55).  The reference handler hardcodes the
    full-size net; optional arch kwargs (defaults unchanged) let imported or
    test-sized checkpoints evaluate — same superset SANHandler provides."""
    int8_family = 'han'

    def build_module(self, scale, dtype, **kwargs):
        cfg = {k: v for k, v in kwargs.items()
               if k in ('n_resgroups', 'n_resblocks', 'n_feats', 'reduction')
               and v is not None}
        return advanced.HAN(scale=scale, dtype=dtype, **cfg)


@register_model('san')
class SANHandler(BaseHandler):
    """(ref: advanced/handlers.py:58-129) — tiled eval replaces forward_chop."""
    tiled_eval = True
    bucketed_eval_ok = False  # non-local spatial softmax + SOCA covariance
    int8_family = 'san'  # int8 RB conv body; composes with the tile grid

    def build_module(self, scale, dtype, **kwargs):
        cfg = {k: v for k, v in kwargs.items()
               if k in ('n_resgroups', 'n_resblocks', 'n_feats', 'reduction')
               and v is not None}
        return san.SAN(scale=scale, dtype=dtype, **cfg)


@register_model('srmd')
class SRMDHandler(QHandler):
    """(ref: advanced/handlers.py:132-158) — metadata concatenated as input maps."""
    colorspace = 'augmented_rgb'
    channel_concat = True
    int8_family = 'srmd'  # whole chain int8 (concat input maps quantize with x)

    def build_module(self, scale, dtype, in_features=3, nc=128, nb=12, **kwargs):
        self.in_channels = in_features or 3
        return advanced.SRMD(in_nc=self.in_channels + self.num_metadata, nc=nc or 128,
                             nb=nb or 12, scale=scale, dtype=dtype)


@register_model('sparnet')
class SPARNetHandler(BaseHandler):
    """(ref: SPARNet/handlers.py:6-18) — pre-upscaled input."""
    im_input = 'interp'
    bucketed_eval_ok = False  # strided hourglass + spatial instance norm

    def build_module(self, scale, dtype, **kwargs):
        cfg = {k: v for k, v in kwargs.items() if k in
               ('min_ch', 'max_ch', 'in_size', 'out_size', 'min_feat_size', 'res_depth',
                'relu_type', 'norm_type', 'att_name', 'bottleneck_size') and v is not None}
        return sparnet.SPARNet(dtype=dtype, **cfg)


@register_model('qsparnet')
class QSPARNetHandler(QHandler):
    """(ref: SPARNet/handlers.py:21-34)"""
    im_input = 'interp'
    bucketed_eval_ok = False  # strided hourglass + spatial instance norm

    def build_module(self, scale, dtype, metadata_encoder_only=False, **kwargs):
        cfg = {k: v for k, v in kwargs.items() if k in
               ('min_ch', 'max_ch', 'in_size', 'out_size', 'min_feat_size', 'res_depth',
                'relu_type', 'norm_type', 'att_name', 'bottleneck_size') and v is not None}
        return sparnet.QSPARNet(metadata_count=self.num_metadata,
                                metadata_encoder_only=bool(metadata_encoder_only),
                                dtype=dtype, **cfg)


@register_model('qrcan', 'qpircan')
class QRCANHandler(QHandler):
    """(ref: attention_manipulators/handlers.py:7-54).  'qpircan' legacy alias
    (ref: models/__init__.py:92-93)."""
    colorspace = 'augmented_rgb'
    # int8 serving: int8 convs + f32 meta-attention (QCALayer/PALayer/ParaCALayer
    # on pooled vectors) — ops/quantization.qrcan_int8_forward_static
    int8_family = 'qrcan'

    def __init__(self, style='modulate', clamp=False, min_mu=-0.2, max_mu=0.8,
                 n_feats=64, **kwargs):
        self.style = style or 'modulate'
        self.clamp = clamp
        self.min_mu = min_mu if min_mu is not None else -0.2
        self.max_mu = max_mu if max_mu is not None else 0.8
        self.n_feats = n_feats or 64
        super().__init__(**kwargs)

    def build_module(self, scale, dtype, in_features=3, include_pixel_attention=False,
                     include_q_layer=False, selective_meta_blocks=None,
                     num_q_layers_inner_residual=None, n_resblocks=20, n_resgroups=10,
                     **kwargs):
        self.in_channels = in_features or 3
        return qmodels.QRCAN(
            n_resblocks=n_resblocks or 20, n_resgroups=n_resgroups or 10,
            n_feats=self.n_feats, in_feats=self.in_channels, scale=scale,
            style=self.style, num_metadata=self.num_metadata,
            include_pixel_attention=bool(include_pixel_attention),
            include_q_layer=bool(include_q_layer),
            selective_meta_blocks=selective_meta_blocks,
            num_q_layers_inner_residual=num_q_layers_inner_residual, dtype=dtype)

    def _metadata_width(self, n_meta):
        return self.n_feats if self.style == 'modulate' else n_meta

    def prepare_metadata(self, x, metadata):
        meta = super().prepare_metadata(x, metadata)
        if self.style == 'modulate':
            meta = self.scale_qpi(meta)
        return meta

    def scale_qpi(self, qpi):
        """Gaussian-profile expansion of normalized QPI to an n_feats modulation vector
        (ref: attention_manipulators/handlers.py:42-54); traced jax version."""
        sig = 0.2
        base = jnp.linspace(0.0, 1.0, self.n_feats, dtype=qpi.dtype)
        mu = qpi[:, :1] * (self.max_mu - self.min_mu) + self.min_mu  # (B, 1)
        prof = (1.0 / (jnp.sqrt(2 * jnp.pi) * sig)) * jnp.exp(
            -jnp.square(base[None, :] - mu) / (2 * sig ** 2))
        if self.clamp:
            prof = jnp.clip(prof, 0.0, 1.0)
        return prof


@register_model('qedsr')
class QEDSRHandler(QHandler):
    """(ref: attention_manipulators/handlers.py:57-76)"""
    colorspace = 'augmented_rgb'
    int8_family = 'qedsr'  # int8 EDSR spine; per-block ParaCALayer gates f32

    def build_module(self, scale, dtype, in_features=3, num_features=64, num_blocks=16,
                     res_scale=0.1, q_layer_nonlinearity=False, **kwargs):
        self.in_channels = in_features or 3
        return qmodels.QEDSR(num_features=num_features or 64, num_blocks=num_blocks or 16,
                             scale=scale, res_scale=res_scale if res_scale is not None
                             else 0.1, in_features=self.in_channels,
                             input_para=self.num_metadata,
                             q_layer_nonlinearity=bool(q_layer_nonlinearity), dtype=dtype)


@register_model('qsan')
class QSANHandler(QHandler):
    """(ref: attention_manipulators/handlers.py:79-153) — tiled eval."""
    tiled_eval = True
    bucketed_eval_ok = False  # non-local spatial softmax + SOCA covariance
    int8_family = 'qsan'  # int8 conv body; composes with the tile grid

    def build_module(self, scale, dtype, n_feats=None, n_resgroups=None,
                     n_resblocks=None, reduction=None, **kwargs):
        # forward the same architecture kwargs SANHandler honors — silently
        # training a default-sized net for a config that asked otherwise is worse
        # than any error
        arch = {k: v for k, v in (('n_feats', n_feats), ('n_resgroups', n_resgroups),
                                  ('n_resblocks', n_resblocks),
                                  ('reduction', reduction)) if v is not None}
        return qmodels.QSAN(scale=scale, input_para=self.num_metadata, dtype=dtype,
                            **arch)


@register_model('qhan')
class QHANHandler(QHandler):
    """(ref: attention_manipulators/handlers.py:156-171)"""
    int8_family = 'qhan'

    def build_module(self, scale, dtype, n_feats=None, n_resgroups=None,
                     n_resblocks=None, reduction=None, **kwargs):
        arch = {k: v for k, v in (('n_feats', n_feats), ('n_resgroups', n_resgroups),
                                  ('n_resblocks', n_resblocks),
                                  ('reduction', reduction)) if v is not None}
        return qmodels.QHAN(scale=scale, num_metadata=self.num_metadata, dtype=dtype,
                            **arch)


@register_model('sftmd')
class SFTMDHandler(QHandler):
    """(ref: SFTMD_variants/handlers.py:6-60).

    Without q-injection the metadata feeds the SFT layers as spatial maps; with
    q-injection (or concat_strategy) it stays a vector.
    """
    colorspace = 'augmented_rgb'
    loss_type = 'l1'
    int8_family = 'sftmd'  # int8 conv spine; SFT modulation + q-injection f32
    # bucketed eval stays exact despite the in-module broadcast of vector
    # metadata to full-resolution para maps: the conv interceptor masks every
    # nn.Conv INPUT (ops/masking.py:111-121), so pad-region para values are
    # zeroed before any SFT concat conv reads them
    # (tests/test_bucketed_eval.py::test_bucketed_eval_exact[sftmd])

    def __init__(self, concat_strategy=False, q_injection=False, **kwargs):
        self.concat_strategy = bool(concat_strategy)
        self.q_injection = bool(q_injection)
        super().__init__(**kwargs)
        if self.concat_strategy:
            self.channel_concat = True

    @property
    def module_takes_metadata(self):
        return True  # SFT layers always consume metadata, even with concat_strategy

    def build_module(self, scale, dtype, in_nc=3, num_features=64, num_blocks=16,
                     SFT_type='standard', sft_type=None, mask_para=False, repeats=None,
                     q_layers=2, **kwargs):
        self.in_channels = in_nc or 3
        in_total = self.in_channels + (self.num_metadata if self.concat_strategy else 0)
        return sftmd.SFTMD(in_nc=in_total, num_features=num_features or 64,
                           num_blocks=num_blocks or 16, scale=scale,
                           input_para=self.num_metadata,
                           sft_type=sft_type or SFT_type or 'standard',
                           mask_para=bool(mask_para), repeats=repeats,
                           q_injection=self.q_injection, q_layers=q_layers or 2,
                           dtype=dtype)

    def _prep_batch(self, batch):
        x, y, metadata = super()._prep_batch(batch)
        if self.channel_concat:
            # the base concat path nulls metadata, but SFTMD ALWAYS takes a
            # metadata arg (SFT layers + q-injection): re-supply the source
            # vector — with q_injection too, or concat+q configs crashed at the
            # first step trace
            metadata = self.prepare_metadata(x, batch.get('metadata'))
        return x, y, metadata

