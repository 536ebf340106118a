"""Int8 quantized inference (serving fast path).

TPU v5e executes int8 x int8 -> int32 matmuls/convs at twice the bf16 MXU rate
(measured here: ~1.33x end-to-end on 3x3 convs after requantization overhead).  This
module provides weight quantization + a quantized EDSR forward as the pattern:

* weights: symmetric per-output-channel int8 (scale = max|w| / 127 over H,W,I);
* activations: dynamic symmetric per-tensor int8, requantized before every conv;
* accumulation in int32, dequantize -> bias/activation/residual math in f32.

Two activation-quantization modes, both measured end-to-end on v5e (EDSR 64f/16b,
4x, batch 16):

* dynamic per-tensor scales (``edsr_int8_forward``): 0.75x bf16 — the per-layer
  max-reduce + round/cast overhead eats the raw 1.33x int8-conv advantage;
* static calibrated scales (``calibrate_edsr_scales`` + ``edsr_int8_forward_static``):
  1.08x bf16 with the f32 residual carry; narrowing the residual stream (read twice,
  written once per block — pure HBM traffic) recovers most of the remaining gap:
  **1.16-1.25x bf16 across runs with residual_dtype='bfloat16' or 'int16'** (the two
  narrow carries are within run-to-run noise of each other; f32 is consistently
  1.08x), at ~55 dB output fidelity vs the f32 model.

The same recipe generalizes to the RCAN/QRCAN family (``quantize_rcan_params`` /
``calibrate_rcan_scales`` / ``rcan_int8_forward_static``): int8 convs + f32 channel
attention = **1.17x** the bf16 RCAN (102.3 vs 87.4 img/s, 40.7 dB fidelity) — RCAN's
C=64 convs run at ~13% MXU (64-of-128-lane waste), so int8's doubled MXU rate is the
effective lever where layout changes are not (see ROADMAP 'MXU lane utilization').

Opt-in serving path; the reference-parity eval pipeline stays f32.
"""
import numpy as np

import jax
import jax.numpy as jnp


def quantize_kernel_int8(kernel):
    """HWIO conv kernel -> (int8 kernel, per-out-channel f32 scales)."""
    kernel = jnp.asarray(kernel)
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_activations(x):
    """Dynamic per-tensor symmetric int8 quantization."""
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def conv_int8(x, q_kernel, w_scale, bias=None, x_scale=None):
    """3x3-style SAME conv with int8 inputs, int32 accumulation, f32 dequant.

    :param x: f32/bf16 activations (quantized here when ``x_scale`` is None) or
        pre-quantized int8 with its scale.
    """
    if x_scale is None:
        x_q, x_scale = quantize_activations(x)
    else:
        x_q = x
    dn = jax.lax.conv_dimension_numbers(x_q.shape, q_kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(x_q, q_kernel, (1, 1), 'SAME',
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        out = out + bias
    return out


def _q_entry(entry):
    """Quantize one conv param entry: int8 HWIO kernel + per-out-channel scales."""
    qk, sc = quantize_kernel_int8(entry['kernel'])
    return {'kernel': qk, 'scale': sc,
            'bias': jnp.asarray(entry['bias'], jnp.float32)}


def _f32_tree(tree):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tree)


def _fconv(entry, h, compute_dtype=None):
    """SAME conv + bias (the calibration mirrors' conv primitive).

    Default: plain f32.  ``compute_dtype=jnp.bfloat16`` runs the conv with bf16
    operands (f32 MXU accumulation) and returns bf16 — the serving forwards use
    it so the float attention/modulation stages match the bf16 model's HBM
    traffic instead of doubling it (measured: f32 LAM/CSAM/SFT stages made the
    int8 HAN/SFTMD forwards *slower* than the bf16 models they serve)."""
    k, b = entry['kernel'], entry['bias']
    if compute_dtype is not None:
        h, k = h.astype(compute_dtype), k.astype(compute_dtype)
    dn = jax.lax.conv_dimension_numbers(h.shape, k.shape, ('NHWC', 'HWIO', 'NHWC'))
    out = jax.lax.conv_general_dilated(h, k, (1, 1), 'SAME',
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)
    if compute_dtype is not None:
        return out.astype(compute_dtype) + b.astype(compute_dtype)
    return out + b


def _absmax_tracker():
    """(track, maxes): record per-name activation absmax during a mirror pass."""
    maxes = {}

    def track(name, h):
        maxes[name] = max(maxes.get(name, 0.0), float(jnp.max(jnp.abs(h))))
        return h

    return track, maxes


def _finalize_scales(maxes, margin):
    return {k: np.float32(max(v * margin, 1e-12) / 127.0)
            for k, v in maxes.items()}


def quantize_edsr_params(params):
    """Quantize an EDSR parameter tree (models/advanced.py naming) to int8."""
    def q(entry):
        qk, s = quantize_kernel_int8(entry['kernel'])
        return {'kernel': qk, 'scale': s, 'bias': jnp.asarray(entry['bias'],
                                                              jnp.float32)}

    out = {'head': q(params['head']), 'body_tail': q(params['body_tail']),
           'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()}}
    for name, block in params.items():
        if name.startswith('block_'):
            out[name] = {'conv_0': q(block['conv_0']), 'conv_1': q(block['conv_1'])}
    return out


def edsr_int8_forward(qparams, x, num_blocks=16, scale=4, res_scale=0.1):
    """Quantized-inference EDSR forward (mirrors models/advanced.py EDSR)."""
    from ..models.blocks import pixel_shuffle

    def qconv(name_tree, h):
        return conv_int8(h, name_tree['kernel'], name_tree['scale'], name_tree['bias'])

    h = qconv(qparams['head'], x)
    res = h
    for i in range(num_blocks):
        blk = qparams['block_%d' % i]
        y = jax.nn.relu(qconv(blk['conv_0'], res))
        y = qconv(blk['conv_1'], y)
        res = res + y * res_scale
    res = qconv(qparams['body_tail'], res) + h
    n_up = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
    for i in range(n_up):
        res = qconv(qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 3 if scale == 3 else 2)
    return qconv(qparams['tail'], res)


def calibrate_edsr_scales(params, sample_batches, num_blocks=16, scale=4, res_scale=0.1,
                          margin=1.0):
    """Record per-conv-input absmax over calibration batches -> static activation scales.

    Returns a dict conv-name -> float32 scale (absmax * margin / 127).
    """
    maxes = {}

    def track(name, x):
        m = float(jnp.max(jnp.abs(x)))
        maxes[name] = max(maxes.get(name, 0.0), m)
        return x

    from ..models.blocks import pixel_shuffle

    fconv = _fconv

    if not sample_batches:
        raise ValueError('no calibration batches provided.')
    for x in sample_batches:
        x = jnp.asarray(x, jnp.float32)
        h = fconv(params['head'], track('head', x))
        res = h
        track('_residual', h)
        for i in range(num_blocks):
            blk = params['block_%d' % i]
            y = jax.nn.relu(fconv(blk['conv_0'], track('block_%d.conv_0' % i, res)))
            y = fconv(blk['conv_1'], track('block_%d.conv_1' % i, y))
            res = track('_residual', res + y * res_scale)
        res = fconv(params['body_tail'], track('body_tail', res)) + h
        n_up = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
        for i in range(n_up):
            res = fconv(params['upsampler']['conv_%d' % i],
                        track('upsampler.conv_%d' % i, res))
            res = pixel_shuffle(res, 3 if scale == 3 else 2)
        track('tail', res)
    res_absmax = maxes.pop('_residual')
    scales = {k: np.float32(max(v * margin, 1e-12) / 127.0) for k, v in maxes.items()}
    # int16 fixed-point grid for the residual-carry datapath (residual_dtype='int16')
    scales['residual16'] = np.float32(max(res_absmax * margin, 1e-12) / 32767.0)
    return scales


def conv_int8_static(x, q_kernel, w_scale, x_scale, bias=None):
    """int8 conv with a precomputed (static) activation scale — no runtime max-reduce."""
    # quantize in f32 even for bf16 feeds (bf16's 8-bit mantissa would add ~0.4%
    # pre-round noise); the cast fuses into the elementwise quantize pass
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                   -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x_q.shape, q_kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(x_q, q_kernel, (1, 1), 'SAME',
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        out = out + bias
    return out


def edsr_int8_forward_static(qparams, act_scales, x, num_blocks=16, scale=4,
                             res_scale=0.1, residual_dtype='float32'):
    """Quantized EDSR forward with calibrated static activation scales.

    ``residual_dtype`` selects the datapath that carries the long-lived residual
    stream (the block-to-block accumulator plus the head skip connection, read
    twice and written once per block — pure HBM traffic):

    * ``'float32'``: residual carried in f32 (the baseline static-int8 path);
    * ``'bfloat16'``: residual carried in bf16 — halves the residual-stream HBM
      traffic at no extra quantization machinery (bf16 has f32's range);
    * ``'int16'``: residual carried as int16 fixed-point with a single calibrated
      scale (``act_scales['residual16']``, produced by :func:`calibrate_edsr_scales`)
      — same 2-byte traffic as bf16 but integer elementwise math.

    Measured end-to-end on v5e (EDSR 64f/16b, 4x, batch 16), relative to the bf16
    model: f32 residual 1.08x; bf16/int16 residuals 1.16-1.25x across runs (within
    noise of each other), all at ~55 dB output fidelity vs the f32 forward
    (reproduce with ``python -m sisr_tpu.tools.bench_quantization``).
    """
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16', 'int16'):
        raise ValueError('residual_dtype must be float32 | bfloat16 | int16')
    if residual_dtype == 'int16':
        return _edsr_int8_forward_res16(qparams, act_scales, x, num_blocks, scale,
                                        res_scale)
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    h = qconv('head', qparams['head'], x).astype(carry_t)
    res = h
    for i in range(num_blocks):
        blk = qparams['block_%d' % i]
        y = jax.nn.relu(qconv('block_%d.conv_0' % i, blk['conv_0'], res))
        y = qconv('block_%d.conv_1' % i, blk['conv_1'], y)
        res = res + (y * res_scale).astype(carry_t)
    res = qconv('body_tail', qparams['body_tail'], res) + h.astype(jnp.float32)
    n_up = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
    for i in range(n_up):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 3 if scale == 3 else 2)
    return qconv('tail', qparams['tail'], res)


def quantize_vdsr_params(params):
    """Quantize a VDSR parameter tree (models/basic.py naming: conv_0..conv_N)."""
    q = _q_entry

    return {k: q(v) for k, v in params.items() if k.startswith('conv_')}


def _vdsr_float_forward(params, x, track=None):
    """f32 VDSR forward used for calibration (mirrors models/basic.py VDSR,
    padding='same')."""
    tr = track or (lambda name, h: h)

    fconv = _fconv

    n = sum(1 for k in params if k.startswith('conv_'))
    out = jnp.asarray(x, jnp.float32)
    residual = out
    for i in range(n):
        out = fconv(params['conv_%d' % i], tr('conv_%d' % i, out))
        if i != n - 1:
            out = jax.nn.relu(out)
    return out + residual


def calibrate_vdsr_scales(params, sample_batches, margin=1.0):
    """Static activation scales for the int8 VDSR forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    if not sample_batches:
        raise ValueError('no calibration batches provided.')
    for x in sample_batches:
        _vdsr_float_forward(params, x, track=track)
    return _finalize_scales(maxes, margin)


def vdsr_int8_forward_static(qparams, act_scales, x):
    """Quantized VDSR forward: the whole 20-conv chain int8 at the pre-upscaled
    (full HR) resolution — the conv-heaviest per-pixel family in the zoo."""
    n = sum(1 for k in qparams if k.startswith('conv_'))
    out = jnp.asarray(x, jnp.float32)
    residual = out
    for i in range(n):
        tree = qparams['conv_%d' % i]
        out = conv_int8_static(out, tree['kernel'], tree['scale'],
                               act_scales['conv_%d' % i], tree['bias'])
        if i != n - 1:
            out = jax.nn.relu(out)
    return out + residual


def quantize_srmd_params(params):
    """Quantize an SRMD parameter tree (models/advanced.py naming: conv_0..conv_N
    + conv_tail) — a plain conv chain over RGB+metadata maps."""
    q = _q_entry

    return {k: q(v) for k, v in params.items()
            if k.startswith('conv_') or k == 'conv_tail'}


def _srmd_float_forward(params, x, scale, track=None):
    """f32 SRMD forward used for calibration (mirrors models/advanced.py SRMD;
    ``x`` is the handler-concatenated RGB+metadata-map input)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)

    fconv = _fconv

    n = sum(1 for k in params if k.startswith('conv_') and k != 'conv_tail')
    out = jnp.asarray(x, jnp.float32)
    for i in range(n):
        out = jax.nn.relu(fconv(params['conv_%d' % i], tr('conv_%d' % i, out)))
    out = fconv(params['conv_tail'], tr('conv_tail', out))
    return pixel_shuffle(out, scale)


def calibrate_srmd_scales(params, sample_batches, scale, margin=1.0):
    """Static activation scales for the int8 SRMD forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    if not sample_batches:
        raise ValueError('no calibration batches provided.')
    for x in sample_batches:
        _srmd_float_forward(params, x, scale, track=track)
    return _finalize_scales(maxes, margin)


def srmd_int8_forward_static(qparams, act_scales, x, scale):
    """Quantized SRMD forward: the whole chain int8 (channel-concat input)."""
    from ..models.blocks import pixel_shuffle

    n = sum(1 for k in qparams if k.startswith('conv_') and k != 'conv_tail')
    out = jnp.asarray(x, jnp.float32)
    for i in range(n):
        tree = qparams['conv_%d' % i]
        out = jax.nn.relu(conv_int8_static(out, tree['kernel'], tree['scale'],
                                           act_scales['conv_%d' % i],
                                           tree['bias']))
    tree = qparams['conv_tail']
    out = conv_int8_static(out, tree['kernel'], tree['scale'],
                           act_scales['conv_tail'], tree['bias'])
    return pixel_shuffle(out, scale)


def quantize_rcan_params(params, n_resgroups=10, n_resblocks=20):
    """Quantize an RCAN parameter tree (models/advanced.py naming) to int8.

    Only the 3x3 convs are quantized (the MXU-lane-limited hot path at C=64 —
    see ROADMAP 'MXU lane utilization'); each RCAB's channel-attention Dense
    pair stays f32 (negligible FLOPs, and sigmoid gates are precision-sensitive).
    """
    q = _q_entry

    out = {'head': q(params['head']), 'body_tail': q(params['body_tail']),
           'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()}}
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        qg = {'conv_tail': q(grp['conv_tail'])}
        for b in range(n_resblocks):
            blk = grp['rcab_%d' % b]
            qg['rcab_%d' % b] = {
                'conv_0': q(blk['conv_0']), 'conv_1': q(blk['conv_1']),
                'ca': jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                             blk['ca']),
            }
        out['group_%d' % g] = qg
    return out


def _rcan_float_forward(params, x, n_resgroups, n_resblocks, track=None):
    """f32 RCAN forward used for calibration (mirrors models/advanced.py RCAN)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)

    fconv = _fconv

    def ca(entry, h):
        a = jnp.mean(h, axis=(1, 2))
        a = jax.nn.relu(a @ entry['du_0']['kernel'] + entry['du_0']['bias'])
        a = jax.nn.sigmoid(a @ entry['du_1']['kernel'] + entry['du_1']['bias'])
        return h * a[:, None, None, :]

    h = fconv(params['head'], tr('head', x))
    res = tr('_residual', h)
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['rcab_%d' % b]
            pre = 'group_%d.rcab_%d' % (g, b)
            y = jax.nn.relu(fconv(blk['conv_0'], tr(pre + '.conv_0', r)))
            y = fconv(blk['conv_1'], tr(pre + '.conv_1', y))
            r = tr('_residual', ca(blk['ca'], y) + r)
        res = tr('_residual',
                 fconv(grp['conv_tail'], tr('group_%d.conv_tail' % g, r)) + res)
    res = fconv(params['body_tail'], tr('body_tail', res)) + h
    _check_rcan_upsampler_pow2(params['upsampler'])
    for i in range(sum(1 for k in params['upsampler'] if k.startswith('conv_'))):
        res = fconv(params['upsampler']['conv_%d' % i],
                    tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 2)
    return fconv(params['tail'], tr('tail', res))


def _check_rcan_upsampler_pow2(upsampler):
    """One conv + x2 shuffle per stage only covers power-of-2 scales; fail early for
    the x3 Upsampler (9*n_feat conv) instead of deep inside XLA."""
    k = upsampler['conv_0']['kernel']
    if k.shape[-1] != 4 * k.shape[-2]:
        raise NotImplementedError('int8 RCAN path supports power-of-2 scales only '
                                  '(x3 upsampler detected: conv_0 %s)'
                                  % str(tuple(k.shape)))


def calibrate_rcan_scales(params, sample_batches, n_resgroups=10, n_resblocks=20,
                          margin=1.0):
    """Static activation scales for the int8 RCAN forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    if not sample_batches:
        raise ValueError('no calibration batches provided.')
    for x in sample_batches:
        _rcan_float_forward(params, jnp.asarray(x, jnp.float32), n_resgroups,
                            n_resblocks, track=track)
    maxes.pop('_residual')  # RCAN supports only f32/bf16 residual carries (no int16)
    return _finalize_scales(maxes, margin)


def rcan_int8_forward_static(qparams, act_scales, x, n_resgroups=10, n_resblocks=20,
                             residual_dtype='bfloat16', ca_epilogue='xla'):
    """Quantized RCAN/QRCAN-base forward: int8 convs + f32 channel attention.

    Same recipe as :func:`edsr_int8_forward_static` (static calibrated activation
    scales, narrow residual carry).  The channel-attention pool/dense/sigmoid runs
    in f32 on the (B, C) pooled vector — negligible cost next to the convs.

    ``ca_epilogue='pallas'`` runs each RCAB tail (CA scale + residual add) as one
    Pallas dispatch (ops/pallas/channel_attention.fused_channel_attention_residual)
    — the memory-bound chain XLA cannot fuse across the int8 dot.  Numerics differ
    from 'xla' only in rounding order (scale+add in f32, one cast at the end);
    measured via tools/bench_pallas_epilogue before being claimed as a win.
    """
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    def ca(entry, h):
        a = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        a = jax.nn.relu(a @ entry['du_0']['kernel'] + entry['du_0']['bias'])
        a = jax.nn.sigmoid(a @ entry['du_1']['kernel'] + entry['du_1']['bias'])
        return h * a[:, None, None, :].astype(h.dtype)

    def ca_res(entry, h, r):
        if ca_epilogue == 'pallas':
            from .pallas.channel_attention import fused_channel_attention_residual
            return fused_channel_attention_residual(
                h, r, entry['du_0']['kernel'], entry['du_0']['bias'],
                entry['du_1']['kernel'], entry['du_1']['bias'])
        return ca(entry, h).astype(carry_t) + r

    h = qconv('head', qparams['head'], x).astype(carry_t)
    res = h
    for g in range(n_resgroups):
        grp = qparams['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['rcab_%d' % b]
            pre = 'group_%d.rcab_%d' % (g, b)
            y = jax.nn.relu(qconv(pre + '.conv_0', blk['conv_0'], r))
            y = qconv(pre + '.conv_1', blk['conv_1'], y)
            r = ca_res(blk['ca'], y, r)
        res = qconv('group_%d.conv_tail' % g, grp['conv_tail'], r).astype(carry_t) \
            + res
    res = qconv('body_tail', qparams['body_tail'], res) + h.astype(jnp.float32)
    _check_rcan_upsampler_pow2(qparams['upsampler'])
    for i in range(sum(1 for k in qparams['upsampler'] if k.startswith('conv_'))):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 2)
    return qconv('tail', qparams['tail'], res)


def quantize_han_params(params, n_resgroups=10, n_resblocks=20):
    """Quantize a HAN parameter tree (models/advanced.py naming) to int8.

    HAN = the RCAN body + layer attention (LAM) + channel-spatial attention
    (CSAM) + two fusion convs: the 3x3 convs (incl. the wide ``last_conv``
    (N+1)*C->C fusion, the biggest single matmul in the net) go int8; LAM and
    CSAM stay f32 (softmax/sigmoid gates over tiny FLOPs)."""
    q = _q_entry

    f32 = _f32_tree

    out = quantize_rcan_params(params, n_resgroups, n_resblocks)
    out['last_conv'] = q(params['last_conv'])
    out['last'] = q(params['last'])
    out['la'] = f32(params['la'])
    out['csa'] = f32(params['csa'])
    return out


def _lam_apply(entry, stack, compute_dtype=None):
    """LAM on the (B, N, H, W, C) stack (mirrors models/advanced.py LAM).

    f32 by default (calibration mirrors); the int8 serving forwards pass
    ``compute_dtype=jnp.bfloat16`` so the N-deep stacked volume — the largest
    tensor in the whole model — moves through HBM at the bf16 model's rate.
    The (B, N, N) gram/softmax stays f32 (tiny, accuracy-critical)."""
    if compute_dtype is not None:
        stack = stack.astype(compute_dtype)
    b, n, h, w, c = stack.shape
    flat = stack.reshape(b, n, -1)
    energy = jnp.einsum('bnd,bmd->bnm', flat, flat,
                        preferred_element_type=jnp.float32)
    energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
    attention = jax.nn.softmax(energy_new, axis=-1).astype(flat.dtype)
    out = jnp.einsum('bnm,bmd->bnd', attention, flat,
                     preferred_element_type=jnp.float32).astype(flat.dtype)
    out = (entry['gamma'].astype(flat.dtype) * out.reshape(b, n, h, w, c)
           + stack)
    return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)


def _csam_apply(entry, h_in, compute_dtype=None):
    """CSAM on the (B, H, W, C) map (mirrors models/advanced.py CSAM).

    f32 by default; ``compute_dtype=jnp.bfloat16`` in the int8 serving forwards
    (f32 MXU accumulation via preferred_element_type)."""
    k = entry['conv3d_kernel']
    if compute_dtype is not None:
        h_in, k = h_in.astype(compute_dtype), k.astype(compute_dtype)
    vol = h_in.transpose(0, 3, 1, 2)[..., None]
    dn = jax.lax.conv_dimension_numbers(vol.shape, k.shape,
                                        ('NDHWC', 'DHWIO', 'NDHWC'))
    out = jax.lax.conv_general_dilated(vol, k, (1, 1, 1), 'SAME',
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)
    out = jax.nn.sigmoid(out + entry['conv3d_bias']).astype(h_in.dtype)
    out = entry['gamma'].astype(h_in.dtype) * out[..., 0].transpose(0, 2, 3, 1)
    return h_in * out + h_in


def _han_float_forward(params, x, n_resgroups, n_resblocks, track=None):
    """f32 HAN forward used for calibration (mirrors models/advanced.py HAN)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)

    fconv = _fconv

    def ca(entry, h):
        a = jnp.mean(h, axis=(1, 2))
        a = jax.nn.relu(a @ entry['du_0']['kernel'] + entry['du_0']['bias'])
        a = jax.nn.sigmoid(a @ entry['du_1']['kernel'] + entry['du_1']['bias'])
        return h * a[:, None, None, :]

    h = fconv(params['head'], tr('head', x))
    res = tr('_residual', h)
    stack = []
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['rcab_%d' % b]
            pre = 'group_%d.rcab_%d' % (g, b)
            y = jax.nn.relu(fconv(blk['conv_0'], tr(pre + '.conv_0', r)))
            y = fconv(blk['conv_1'], tr(pre + '.conv_1', y))
            r = tr('_residual', ca(blk['ca'], y) + r)
        res = tr('_residual',
                 fconv(grp['conv_tail'], tr('group_%d.conv_tail' % g, r)) + res)
        stack.append(res)
    res = fconv(params['body_tail'], tr('body_tail', res))
    stack.append(res)
    res1 = jnp.stack(stack[::-1], axis=1)  # newest first (ref torch.cat order)
    la = _lam_apply(params['la'], res1)
    out2 = fconv(params['last_conv'], tr('last_conv', la))
    out1 = _csam_apply(params['csa'], res)
    out = jnp.concatenate([out1, out2], axis=-1)
    res = fconv(params['last'], tr('last', out)) + h
    _check_rcan_upsampler_pow2(params['upsampler'])
    for i in range(sum(1 for k in params['upsampler'] if k.startswith('conv_'))):
        res = fconv(params['upsampler']['conv_%d' % i],
                    tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 2)
    return fconv(params['tail'], tr('tail', res))


def calibrate_han_scales(params, sample_batches, n_resgroups=10, n_resblocks=20,
                         margin=1.0):
    """Static activation scales for the int8 HAN forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    if not sample_batches:
        raise ValueError('no calibration batches provided.')
    for x in sample_batches:
        _han_float_forward(params, jnp.asarray(x, jnp.float32), n_resgroups,
                           n_resblocks, track=track)
    maxes.pop('_residual')
    return _finalize_scales(maxes, margin)


def han_int8_forward_static(qparams, act_scales, x, n_resgroups=10, n_resblocks=20,
                            residual_dtype='bfloat16', ca_epilogue='xla'):
    """Quantized HAN forward: int8 convs, f32 per-block channel attention, bf16
    LAM/CSAM (f32 MXU accumulation, f32 gram/softmax).

    Same recipe as :func:`rcan_int8_forward_static`.  The LAM stack is the
    biggest tensor in the model (N+1 stacked feature maps); running it in f32
    made int8 HAN *slower* than the bf16 model (0.73x measured on v5e), so the
    serving path moves it at bf16 — the bf16 model's own rate."""
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    def ca(entry, h):
        a = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        a = jax.nn.relu(a @ entry['du_0']['kernel'] + entry['du_0']['bias'])
        a = jax.nn.sigmoid(a @ entry['du_1']['kernel'] + entry['du_1']['bias'])
        return h * a[:, None, None, :].astype(h.dtype)

    def ca_res(entry, h, r):
        if ca_epilogue == 'pallas':
            from .pallas.channel_attention import fused_channel_attention_residual
            return fused_channel_attention_residual(
                h, r, entry['du_0']['kernel'], entry['du_0']['bias'],
                entry['du_1']['kernel'], entry['du_1']['bias'])
        return ca(entry, h).astype(carry_t) + r

    h = qconv('head', qparams['head'], x).astype(carry_t)
    res = h
    stack = []
    for g in range(n_resgroups):
        grp = qparams['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['rcab_%d' % b]
            pre = 'group_%d.rcab_%d' % (g, b)
            y = jax.nn.relu(qconv(pre + '.conv_0', blk['conv_0'], r))
            y = qconv(pre + '.conv_1', blk['conv_1'], y)
            r = ca_res(blk['ca'], y, r)
        res = qconv('group_%d.conv_tail' % g, grp['conv_tail'], r).astype(carry_t) \
            + res
        stack.append(res)
    res = qconv('body_tail', qparams['body_tail'], res)
    stack.append(res.astype(carry_t))
    res1 = jnp.stack(stack[::-1], axis=1)
    la = _lam_apply(qparams['la'], res1, compute_dtype=jnp.bfloat16)
    out2 = qconv('last_conv', qparams['last_conv'], la)
    out1 = _csam_apply(qparams['csa'], res, compute_dtype=jnp.bfloat16)
    out = jnp.concatenate([out1.astype(jnp.float32), out2], axis=-1)
    res = qconv('last', qparams['last'], out) + h.astype(jnp.float32)
    _check_rcan_upsampler_pow2(qparams['upsampler'])
    for i in range(sum(1 for k in qparams['upsampler'] if k.startswith('conv_'))):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 2)
    return qconv('tail', qparams['tail'], res)


def quantize_qrcan_params(params, n_resgroups=10, n_resblocks=20):
    """Quantize a QRCAN parameter tree (models/qmodels.py naming) to int8.

    Same split as RCAN: the 3x3 convs (the MXU-lane-limited hot path) go int8;
    every attention stage stays f32 — QCALayer/ParaCALayer operate on (B, C)
    pooled/metadata vectors (negligible FLOPs, sigmoid-gated and therefore
    precision-sensitive), and PALayer's two 1x1 convs are C/8-channel.
    """
    q = _q_entry

    f32 = _f32_tree

    out = {'head': q(params['head']), 'final_body': q(params['final_body']),
           'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()}}
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        qg = {'final_body': q(grp['final_body'])}
        for b in range(n_resblocks):
            blk = grp['qrcab_%d' % b]
            qb = {'conv_0': q(blk['conv_0']), 'conv_1': q(blk['conv_1']),
                  'qca': f32(blk['qca'])}
            for extra in ('pa_node', 'q_node'):  # presence mirrors the module config
                if extra in blk:
                    qb[extra] = f32(blk[extra])
            qg['qrcab_%d' % b] = qb
        out['group_%d' % g] = qg
    return out


def quantize_san_params(params, n_resgroups=20, n_resblocks=10):
    """Quantize a SAN parameter tree (models/san.py naming) to int8.

    The LSRAG RB conv body (n_resgroups x n_resblocks x 2 convs + per-group
    conv_last) and head/upsampler/tail go int8; the shared non-local block
    (1x1 g/theta/phi/w + spatial softmax) and SOCA (covariance + Newton-Schulz
    + sigmoid gate) stay f32 — both are precision-sensitive attention stages
    whose FLOPs are small next to the conv body."""
    q = _q_entry

    f32 = _f32_tree

    out = {'head': q(params['head']), 'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()},
           'non_local': f32(params['non_local']),
           'gamma': jnp.asarray(params['gamma'], jnp.float32)}
    for g in range(n_resgroups):
        grp = params['rg_%d' % g]
        qg = {'conv_last': q(grp['conv_last']), 'soca': f32(grp['soca'])}
        for b in range(n_resblocks):
            blk = grp['rb_%d' % b]
            qg['rb_%d' % b] = {'conv_0': q(blk['conv_0']),
                               'conv_1': q(blk['conv_1'])}
        out['rg_%d' % g] = qg
    return out


def _nonlocal_block_apply(entry, x_f32):
    """Embedded-gaussian non-local block in f32 (mirrors models/san.py
    NonLocalBlock2D, incl. the reference's always-on g/phi 2x2 max-pool)."""
    b, h, w, c = x_f32.shape

    def c1x1(e, z):
        dn = jax.lax.conv_dimension_numbers(z.shape, e['kernel'].shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(z, e['kernel'], (1, 1), 'VALID',
                                            dimension_numbers=dn) + e['bias']

    def pool2(z):
        return jax.lax.reduce_window(z, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                     (1, 2, 2, 1), 'VALID')

    inter = entry['g']['kernel'].shape[-1]
    g = pool2(c1x1(entry['g'], x_f32))
    theta = c1x1(entry['theta'], x_f32)
    phi = pool2(c1x1(entry['phi'], x_f32))
    m_sub = g.shape[1] * g.shape[2]
    g = g.reshape(b, m_sub, inter)
    theta = theta.reshape(b, h * w, inter)
    phi = phi.reshape(b, m_sub, inter)
    f = jnp.einsum('bmc,bnc->bmn', theta, phi, preferred_element_type=jnp.float32)
    f = jax.nn.softmax(f, axis=-1)
    y = jnp.einsum('bmn,bnc->bmc', f, g).reshape(b, h, w, inter)
    return c1x1(entry['w'], y) + x_f32


def _nonlocal_ca_apply(entry, x_f32):
    """Quadrant-split non-local (mirrors models/san.py NonlocalCA)."""
    block = entry['non_local']
    b, h, w, c = x_f32.shape
    h1, w1 = h // 2, w // 2
    lu = _nonlocal_block_apply(block, x_f32[:, :h1, :w1, :])
    ld = _nonlocal_block_apply(block, x_f32[:, h1:, :w1, :])
    ru = _nonlocal_block_apply(block, x_f32[:, :h1, w1:, :])
    rd = _nonlocal_block_apply(block, x_f32[:, h1:, w1:, :])
    top = jnp.concatenate([lu, ru], axis=2)
    bot = jnp.concatenate([ld, rd], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _soca_apply(entry, h_f32):
    """SOCA in f32 (mirrors models/san.py SOCA incl. the 1000^2 crop cap)."""
    from ..models.san import covariance_pool, newton_schulz_sqrt
    b, h, w, c = h_f32.shape
    hs = 0 if h < 1000 else (h - 1000) // 2
    ws = 0 if w < 1000 else (w - 1000) // 2
    x_sub = h_f32[:, hs:hs + min(h, 1000), ws:ws + min(w, 1000), :]
    cov_sqrt = newton_schulz_sqrt(covariance_pool(x_sub))
    pooled = cov_sqrt.mean(axis=1)
    y = jax.nn.relu(pooled @ entry['du_0']['kernel'] + entry['du_0']['bias'])
    y = jax.nn.sigmoid(y @ entry['du_1']['kernel'] + entry['du_1']['bias'])
    return h_f32 * y[:, None, None, :]


def _san_float_forward(params, x, n_resgroups, n_resblocks, track=None):
    """f32 SAN forward used for calibration (mirrors models/san.py SAN)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)

    fconv = _fconv

    gamma = jnp.asarray(params['gamma'], jnp.float32)
    h = fconv(params['head'], tr('head', jnp.asarray(x, jnp.float32)))
    xx = _nonlocal_ca_apply(params['non_local'], h)
    residual = tr('_residual', xx)
    for g in range(n_resgroups):
        grp = params['rg_%d' % g]
        r = xx
        for b in range(n_resblocks):
            blk = grp['rb_%d' % b]
            pre = 'rg_%d.rb_%d' % (g, b)
            y = jax.nn.relu(fconv(blk['conv_0'], tr(pre + '.conv_0', r)))
            y = fconv(blk['conv_1'], tr(pre + '.conv_1', y))
            r = tr('_residual', y + r)
        r = _soca_apply(grp['soca'], r)
        xx = tr('_residual',
                fconv(grp['conv_last'], tr('rg_%d.conv_last' % g, r)) + xx
                + gamma * residual)
    res = _nonlocal_ca_apply(params['non_local'], xx) + h
    _check_rcan_upsampler_pow2(params['upsampler'])
    for i in range(sum(1 for k in params['upsampler'] if k.startswith('conv_'))):
        res = fconv(params['upsampler']['conv_%d' % i],
                    tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 2)
    return fconv(params['tail'], tr('tail', res))


def calibrate_san_scales(params, sample_batches, n_resgroups=20, n_resblocks=10,
                         margin=1.0):
    """Static activation scales for the int8 SAN forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    if not sample_batches:
        raise ValueError('no calibration batches provided.')
    for x in sample_batches:
        _san_float_forward(params, jnp.asarray(x, jnp.float32), n_resgroups,
                           n_resblocks, track=track)
    maxes.pop('_residual')
    return _finalize_scales(maxes, margin)


def san_int8_forward_static(qparams, act_scales, x, n_resgroups=20, n_resblocks=10,
                            residual_dtype='bfloat16'):
    """Quantized SAN forward: int8 RB conv body + f32 non-local/SOCA attention."""
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    gamma = qparams['gamma']
    h = qconv('head', qparams['head'], x)
    xx = _nonlocal_ca_apply(qparams['non_local'], h).astype(carry_t)
    residual = xx
    for g in range(n_resgroups):
        grp = qparams['rg_%d' % g]
        r = xx
        for b in range(n_resblocks):
            blk = grp['rb_%d' % b]
            pre = 'rg_%d.rb_%d' % (g, b)
            y = jax.nn.relu(qconv(pre + '.conv_0', blk['conv_0'], r))
            y = qconv(pre + '.conv_1', blk['conv_1'], y)
            r = y.astype(carry_t) + r
        r = _soca_apply(grp['soca'], r.astype(jnp.float32))
        xx = (qconv('rg_%d.conv_last' % g, grp['conv_last'], r).astype(carry_t)
              + xx + (gamma.astype(carry_t) * residual))
    res = _nonlocal_ca_apply(qparams['non_local'],
                             xx.astype(jnp.float32)) + h
    _check_rcan_upsampler_pow2(qparams['upsampler'])
    for i in range(sum(1 for k in qparams['upsampler'] if k.startswith('conv_'))):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 2)
    return qconv('tail', qparams['tail'], res)


def quantize_qsan_params(params, n_resgroups=20, n_resblocks=10):
    """Quantize a QSAN parameter tree to int8: SAN's structure with a ParaCALayer
    gate (f32) inside each residual block."""
    q = _q_entry

    f32 = _f32_tree

    out = {'head': q(params['head']), 'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()},
           'non_local': f32(params['non_local']),
           'gamma': jnp.asarray(params['gamma'], jnp.float32)}
    for g in range(n_resgroups):
        grp = params['rg_%d' % g]
        qg = {'conv_last': q(grp['conv_last']), 'soca': f32(grp['soca'])}
        for b in range(n_resblocks):
            blk = grp['qrb_%d' % b]
            qg['qrb_%d' % b] = {'conv_0': q(blk['conv_0']),
                                'conv_1': q(blk['conv_1']),
                                'q_layer': f32(blk['q_layer'])}
        out['rg_%d' % g] = qg
    return out


def _qsan_float_forward(params, x, metadata, n_resgroups, n_resblocks, track=None):
    """f32 QSAN forward used for calibration (mirrors models/qmodels.py QSAN)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)
    meta = jnp.asarray(metadata, jnp.float32)

    fconv = _fconv

    gamma = jnp.asarray(params['gamma'], jnp.float32)
    h = fconv(params['head'], tr('head', jnp.asarray(x, jnp.float32)))
    xx = _nonlocal_ca_apply(params['non_local'], h)
    residual = tr('_residual', xx)
    for g in range(n_resgroups):
        grp = params['rg_%d' % g]
        r = xx
        for b in range(n_resblocks):
            blk = grp['qrb_%d' % b]
            pre = 'rg_%d.qrb_%d' % (g, b)
            y = jax.nn.relu(fconv(blk['conv_0'], tr(pre + '.conv_0', r)))
            y = fconv(blk['conv_1'], tr(pre + '.conv_1', y))
            y = y * _para_ca_apply(blk['q_layer'], meta)[:, None, None, :]
            r = tr('_residual', y + r)
        r = _soca_apply(grp['soca'], r)
        xx = tr('_residual',
                fconv(grp['conv_last'], tr('rg_%d.conv_last' % g, r)) + xx
                + gamma * residual)
    res = _nonlocal_ca_apply(params['non_local'], xx) + h
    _check_rcan_upsampler_pow2(params['upsampler'])
    for i in range(sum(1 for k in params['upsampler'] if k.startswith('conv_'))):
        res = fconv(params['upsampler']['conv_%d' % i],
                    tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 2)
    return fconv(params['tail'], tr('tail', res))


def calibrate_qsan_scales(params, sample_batches, metadata_batches,
                          n_resgroups=20, n_resblocks=10, margin=1.0):
    """Static activation scales for the int8 QSAN forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    sample_batches = list(sample_batches)
    metadata_batches = list(metadata_batches)
    if not sample_batches:
        raise ValueError('calibrate_qsan_scales: no calibration batches provided.')
    if len(sample_batches) != len(metadata_batches):
        raise ValueError('calibrate_qsan_scales: %d sample batches but %d metadata '
                         'batches.' % (len(sample_batches), len(metadata_batches)))
    for x, meta in zip(sample_batches, metadata_batches):
        _qsan_float_forward(params, x, meta, n_resgroups, n_resblocks, track=track)
    maxes.pop('_residual')
    return _finalize_scales(maxes, margin)


def qsan_int8_forward_static(qparams, act_scales, x, metadata, n_resgroups=20,
                             n_resblocks=10, residual_dtype='bfloat16'):
    """Quantized QSAN forward: int8 conv body + f32 ParaCA/non-local/SOCA."""
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16
    meta = jnp.asarray(metadata, jnp.float32)

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    gamma = qparams['gamma']
    h = qconv('head', qparams['head'], x)
    xx = _nonlocal_ca_apply(qparams['non_local'], h).astype(carry_t)
    residual = xx
    for g in range(n_resgroups):
        grp = qparams['rg_%d' % g]
        r = xx
        for b in range(n_resblocks):
            blk = grp['qrb_%d' % b]
            pre = 'rg_%d.qrb_%d' % (g, b)
            y = jax.nn.relu(qconv(pre + '.conv_0', blk['conv_0'], r))
            y = qconv(pre + '.conv_1', blk['conv_1'], y)
            y = y * _para_ca_apply(blk['q_layer'], meta)[:, None, None, :]
            r = y.astype(carry_t) + r
        r = _soca_apply(grp['soca'], r.astype(jnp.float32))
        xx = (qconv('rg_%d.conv_last' % g, grp['conv_last'], r).astype(carry_t)
              + xx + (gamma.astype(carry_t) * residual))
    res = _nonlocal_ca_apply(qparams['non_local'], xx.astype(jnp.float32)) + h
    _check_rcan_upsampler_pow2(qparams['upsampler'])
    for i in range(sum(1 for k in qparams['upsampler'] if k.startswith('conv_'))):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 2)
    return qconv('tail', qparams['tail'], res)


def quantize_sftmd_params(params, num_blocks=16, scale=4):
    """Quantize an SFTMD parameter tree (models/sftmd.py naming) to int8.

    The nf-channel conv spine (conv1/2/3, per-block conv1/conv2, conv_mid,
    up_conv*, the 9x9 conv_output) goes int8; SFT layers (32-channel modulation
    branches ending in sigmoid) and any q-injection ParaCALayers stay f32."""
    q = _q_entry

    f32 = _f32_tree

    out = {k: q(params[k]) for k in ('conv1', 'conv2', 'conv3', 'conv_mid',
                                     'up_conv1', 'conv_output')}
    if 'up_conv2' in params:
        out['up_conv2'] = q(params['up_conv2'])
    # 'weak'/'none' SFT layers are parameter-less: flax omits their entries
    if 'sft' in params:
        out['sft'] = f32(params['sft'])
    if 'final_injection' in params:
        out['final_injection'] = f32(params['final_injection'])
    for i in range(1, num_blocks + 1):
        blk = params['sft_residual_%d' % i]
        qb = {'conv1': q(blk['conv1']), 'conv2': q(blk['conv2'])}
        for extra in ('sft1', 'sft2'):
            if extra in blk:
                qb[extra] = f32(blk[extra])
        for extra in ('q_1', 'q_2'):
            if extra in blk:
                qb[extra] = f32(blk[extra])
        out['sft_residual_%d' % i] = qb
    return out


def _sft_apply(entry, sft_type, fea, para_maps, repeats=None, mask_para=False,
               compute_dtype=None):
    """SFTLayer math (mirrors models/sftmd.py SFTLayer/StandardSft/ConcatSft).

    f32 by default (the calibration mirrors); the int8 serving forward passes
    ``compute_dtype=jnp.bfloat16`` — the SFT branch convs carry roughly as many
    FLOPs as the nf-channel spine, so leaving them f32 made quantized SFTMD
    slower than the bf16 model (0.72x measured on v5e)."""
    fconv = _fconv
    if compute_dtype is not None:
        fea = fea.astype(compute_dtype)
        para_maps = para_maps.astype(compute_dtype)

    if sft_type == 'none':
        return fea
    if sft_type == 'weak':
        return fea * para_maps
    if sft_type == 'concat':
        cat = jnp.concatenate([fea, para_maps], axis=-1)
        return fconv(entry['sft_module']['conv'], cat, compute_dtype)
    # standard
    mod = entry['sft_module']
    if repeats is not None:
        para_maps = jnp.tile(para_maps, (1, 1, 1, repeats))
    cat = fea if mask_para else jnp.concatenate([fea, para_maps], axis=-1)
    mul = jax.nn.leaky_relu(fconv(mod['mul_conv1'], cat, compute_dtype), 0.2)
    mul = jax.nn.sigmoid(fconv(mod['mul_conv2'], mul, compute_dtype))
    add = jax.nn.leaky_relu(fconv(mod['add_conv1'], cat, compute_dtype), 0.2)
    add = fconv(mod['add_conv2'], add, compute_dtype)
    return fea * mul + add


def _sftmd_float_forward(params, x, metadata, num_blocks=16, scale=4,
                         sft_type='standard', mask_para=False, repeats=None,
                         track=None):
    """f32 SFTMD forward used for calibration (mirrors models/sftmd.py SFTMD;
    ``metadata`` is the flat (B, M) vector — the int8 path's interface)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)
    meta = jnp.asarray(metadata, jnp.float32)

    fconv = _fconv

    x = jnp.asarray(x, jnp.float32)
    para_maps = jnp.broadcast_to(meta[:, None, None, :],
                                 (x.shape[0], x.shape[1], x.shape[2],
                                  meta.shape[-1]))
    fea = jax.nn.leaky_relu(fconv(params['conv1'], tr('conv1', x)), 0.2)
    fea = jax.nn.leaky_relu(fconv(params['conv2'], tr('conv2', fea)), 0.2)
    fea_bef = fconv(params['conv3'], tr('conv3', fea))
    fea_in = fea_bef
    for i in range(1, num_blocks + 1):
        blk = params['sft_residual_%d' % i]
        pre = 'sft_residual_%d' % i
        f1 = jax.nn.relu(_sft_apply(blk.get('sft1'), sft_type, fea_in, para_maps,
                                    repeats, mask_para))
        if 'q_1' in blk:
            f1 = f1 * _para_ca_apply(blk['q_1'], meta)[:, None, None, :]
        f1 = fconv(blk['conv1'], tr(pre + '.conv1', f1))
        f2 = jax.nn.relu(_sft_apply(blk.get('sft2'), sft_type, f1, para_maps,
                                    repeats, mask_para))
        if 'q_2' in blk:
            f2 = f2 * _para_ca_apply(blk['q_2'], meta)[:, None, None, :]
        f3 = fconv(blk['conv2'], tr(pre + '.conv2', f2))
        fea_in = fea_in + f3
    fea_add = fea_in + fea_bef
    fea_fin = _sft_apply(params.get('sft'), sft_type, fea_add, para_maps, repeats,
                         mask_para)
    if 'final_injection' in params:
        fea_fin = fea_fin * _para_ca_apply(params['final_injection'],
                                           meta)[:, None, None, :]
    fea = fconv(params['conv_mid'], tr('conv_mid', fea_fin))
    if scale == 4:
        fea = fconv(params['up_conv1'], tr('up_conv1', fea))
        fea = jax.nn.leaky_relu(pixel_shuffle(fea, 2), 0.2)
        fea = fconv(params['up_conv2'], tr('up_conv2', fea))
        fea = jax.nn.leaky_relu(pixel_shuffle(fea, 2), 0.2)
    else:
        fea = fconv(params['up_conv1'], tr('up_conv1', fea))
        fea = jax.nn.leaky_relu(pixel_shuffle(fea, scale), 0.2)
    out = fconv(params['conv_output'], tr('conv_output', fea))
    return jnp.clip(out, 0.0, 1.0)


def calibrate_sftmd_scales(params, sample_batches, metadata_batches, num_blocks=16,
                           scale=4, sft_type='standard', mask_para=False,
                           repeats=None, margin=1.0):
    """Static activation scales for the int8 SFTMD forward (absmax calibration)."""
    track, maxes = _absmax_tracker()

    sample_batches = list(sample_batches)
    metadata_batches = list(metadata_batches)
    if not sample_batches:
        raise ValueError('calibrate_sftmd_scales: no calibration batches provided.')
    if len(sample_batches) != len(metadata_batches):
        raise ValueError('calibrate_sftmd_scales: %d sample batches but %d metadata '
                         'batches.' % (len(sample_batches), len(metadata_batches)))
    for x, meta in zip(sample_batches, metadata_batches):
        _sftmd_float_forward(params, x, meta, num_blocks, scale, sft_type,
                             mask_para, repeats, track=track)
    return _finalize_scales(maxes, margin)


def sftmd_int8_forward_static(qparams, act_scales, x, metadata, num_blocks=16,
                              scale=4, sft_type='standard', mask_para=False,
                              repeats=None):
    """Quantized SFTMD forward: int8 conv spine + bf16 SFT modulation (f32 MXU
    accumulation) + f32 q-injection gates.  The SFT branches carry ~half the
    model's FLOPs, so they run at the bf16 model's rate rather than f32's."""
    from ..models.blocks import pixel_shuffle

    meta = jnp.asarray(metadata, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    para_maps = jnp.broadcast_to(meta[:, None, None, :],
                                 (x.shape[0], x.shape[1], x.shape[2],
                                  meta.shape[-1]))

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    bf16 = jnp.bfloat16
    fea = jax.nn.leaky_relu(qconv('conv1', qparams['conv1'], x), 0.2)
    fea = jax.nn.leaky_relu(qconv('conv2', qparams['conv2'], fea), 0.2)
    fea_bef = qconv('conv3', qparams['conv3'], fea)
    fea_in = fea_bef
    for i in range(1, num_blocks + 1):
        blk = qparams['sft_residual_%d' % i]
        pre = 'sft_residual_%d' % i
        f1 = jax.nn.relu(_sft_apply(blk.get('sft1'), sft_type, fea_in, para_maps,
                                    repeats, mask_para, compute_dtype=bf16))
        if 'q_1' in blk:
            f1 = f1 * _para_ca_apply(blk['q_1'], meta)[:, None, None, :].astype(f1.dtype)
        f1 = qconv(pre + '.conv1', blk['conv1'], f1)
        f2 = jax.nn.relu(_sft_apply(blk.get('sft2'), sft_type, f1, para_maps,
                                    repeats, mask_para, compute_dtype=bf16))
        if 'q_2' in blk:
            f2 = f2 * _para_ca_apply(blk['q_2'], meta)[:, None, None, :].astype(f2.dtype)
        f3 = qconv(pre + '.conv2', blk['conv2'], f2)
        fea_in = fea_in + f3
    fea_add = fea_in + fea_bef
    fea_fin = _sft_apply(qparams.get('sft'), sft_type, fea_add, para_maps, repeats,
                         mask_para, compute_dtype=bf16)
    if 'final_injection' in qparams:
        fea_fin = fea_fin * _para_ca_apply(qparams['final_injection'],
                                           meta)[:, None, None, :]
    fea = qconv('conv_mid', qparams['conv_mid'], fea_fin)
    if scale == 4:
        fea = qconv('up_conv1', qparams['up_conv1'], fea)
        fea = jax.nn.leaky_relu(pixel_shuffle(fea, 2), 0.2)
        fea = qconv('up_conv2', qparams['up_conv2'], fea)
        fea = jax.nn.leaky_relu(pixel_shuffle(fea, 2), 0.2)
    else:
        fea = qconv('up_conv1', qparams['up_conv1'], fea)
        fea = jax.nn.leaky_relu(pixel_shuffle(fea, scale), 0.2)
    out = qconv('conv_output', qparams['conv_output'], fea)
    return jnp.clip(out, 0.0, 1.0)


def quantize_qhan_params(params, n_resgroups=10, n_resblocks=20):
    """Quantize a QHAN parameter tree to int8: HAN's outer structure (LAM/CSAM +
    fusion convs) with QRCAN-style meta-attention groups — convs int8, every
    attention stage (QCA/ParaCA/LAM/CSAM) f32."""
    q = _q_entry

    f32 = _f32_tree

    out = {'head': q(params['head']), 'body_tail': q(params['body_tail']),
           'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()},
           'last_conv': q(params['last_conv']), 'last': q(params['last']),
           'la': f32(params['la']), 'csa': f32(params['csa'])}
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        qg = {'final_body': q(grp['final_body'])}
        for b in range(n_resblocks):
            blk = grp['qrcab_%d' % b]
            qb = {'conv_0': q(blk['conv_0']), 'conv_1': q(blk['conv_1']),
                  'qca': f32(blk['qca'])}
            for extra in ('pa_node', 'q_node'):
                if extra in blk:
                    qb[extra] = f32(blk[extra])
            qg['qrcab_%d' % b] = qb
        out['group_%d' % g] = qg
    return out


def _qhan_float_forward(params, x, metadata, n_resgroups, n_resblocks, track=None):
    """f32 QHAN forward used for calibration (mirrors models/qmodels.py QHAN:
    QResidualGroup(style='standard', q_layer=True) body + HAN LAM/CSAM tail)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)
    meta = jnp.asarray(metadata, jnp.float32)

    fconv = _fconv

    h = fconv(params['head'], tr('head', jnp.asarray(x, jnp.float32)))
    res = tr('_residual', h)
    stack = []
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['qrcab_%d' % b]
            pre = 'group_%d.qrcab_%d' % (g, b)
            y = jax.nn.relu(fconv(blk['conv_0'], tr(pre + '.conv_0', r)))
            y = fconv(blk['conv_1'], tr(pre + '.conv_1', y))
            att = _qca_apply(blk['qca'], jnp.mean(y, axis=(1, 2)), meta, 'standard')
            y = y * att[:, None, None, :]
            if 'pa_node' in blk:
                y = _pa_apply(blk['pa_node'], y)
            if 'q_node' in blk:
                y = y * _para_ca_apply(blk['q_node'], meta)[:, None, None, :]
            r = tr('_residual', y + r)
        res = tr('_residual',
                 fconv(grp['final_body'], tr('group_%d.final_body' % g, r)) + res)
        stack.append(res)
    res = fconv(params['body_tail'], tr('body_tail', res))
    stack.append(res)
    res1 = jnp.stack(stack[::-1], axis=1)
    la = _lam_apply(params['la'], res1)
    out2 = fconv(params['last_conv'], tr('last_conv', la))
    out1 = _csam_apply(params['csa'], res)
    out = jnp.concatenate([out1, out2], axis=-1)
    res = fconv(params['last'], tr('last', out)) + h
    _check_rcan_upsampler_pow2(params['upsampler'])
    for i in range(sum(1 for k in params['upsampler'] if k.startswith('conv_'))):
        res = fconv(params['upsampler']['conv_%d' % i],
                    tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 2)
    return fconv(params['tail'], tr('tail', res))


def calibrate_qhan_scales(params, sample_batches, metadata_batches,
                          n_resgroups=10, n_resblocks=20, margin=1.0):
    """Static activation scales for the int8 QHAN forward (absmax calibration);
    ``metadata_batches`` is the handler-prepared metadata per sample batch."""
    track, maxes = _absmax_tracker()

    sample_batches = list(sample_batches)
    metadata_batches = list(metadata_batches)
    if not sample_batches:
        raise ValueError('calibrate_qhan_scales: no calibration batches provided.')
    if len(sample_batches) != len(metadata_batches):
        raise ValueError('calibrate_qhan_scales: %d sample batches but %d metadata '
                         'batches.' % (len(sample_batches), len(metadata_batches)))
    for x, meta in zip(sample_batches, metadata_batches):
        _qhan_float_forward(params, x, meta, n_resgroups, n_resblocks, track=track)
    maxes.pop('_residual')
    return _finalize_scales(maxes, margin)


def qhan_int8_forward_static(qparams, act_scales, x, metadata, n_resgroups=10,
                             n_resblocks=20, residual_dtype='bfloat16'):
    """Quantized QHAN forward: int8 convs + f32 meta-attention gates + bf16
    LAM/CSAM (f32 MXU accumulation; see :func:`han_int8_forward_static`)."""
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16
    meta = jnp.asarray(metadata, jnp.float32)

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    h = qconv('head', qparams['head'], x).astype(carry_t)
    res = h
    stack = []
    for g in range(n_resgroups):
        grp = qparams['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['qrcab_%d' % b]
            pre = 'group_%d.qrcab_%d' % (g, b)
            y = jax.nn.relu(qconv(pre + '.conv_0', blk['conv_0'], r))
            y = qconv(pre + '.conv_1', blk['conv_1'], y)
            att = _qca_apply(blk['qca'],
                             jnp.mean(y, axis=(1, 2)).astype(jnp.float32), meta,
                             'standard')
            y = y * att[:, None, None, :].astype(y.dtype)
            if 'pa_node' in blk:
                y = _pa_apply(blk['pa_node'], y)
            if 'q_node' in blk:
                y = y * _para_ca_apply(blk['q_node'],
                                       meta)[:, None, None, :].astype(y.dtype)
            r = y.astype(carry_t) + r
        res = qconv('group_%d.final_body' % g, grp['final_body'], r).astype(carry_t) \
            + res
        stack.append(res)
    res = qconv('body_tail', qparams['body_tail'], res)
    stack.append(res.astype(carry_t))
    res1 = jnp.stack(stack[::-1], axis=1)
    la = _lam_apply(qparams['la'], res1, compute_dtype=jnp.bfloat16)
    out2 = qconv('last_conv', qparams['last_conv'], la)
    out1 = _csam_apply(qparams['csa'], res, compute_dtype=jnp.bfloat16)
    out = jnp.concatenate([out1.astype(jnp.float32), out2], axis=-1)
    res = qconv('last', qparams['last'], out) + h.astype(jnp.float32)
    _check_rcan_upsampler_pow2(qparams['upsampler'])
    for i in range(sum(1 for k in qparams['upsampler'] if k.startswith('conv_'))):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 2)
    return qconv('tail', qparams['tail'], res)


def _dense_apply(entry, y):
    return y @ entry['kernel'] + entry['bias']


def _qca_apply(entry, pooled, meta, style):
    """QCALayer math in f32 on the pooled (B, C) vector (models/q_layers.py:100-146)."""
    y = pooled
    if style in ('modulate', 'standard'):
        y = jax.nn.relu(_dense_apply(entry['du_0'], y))
        y = jax.nn.sigmoid(_dense_apply(entry['du_1'], y))
        if style == 'modulate':
            y = y * meta
    elif style in ('max_concat', 'softmax'):
        y = jnp.concatenate([y, meta], axis=-1)
        y = jax.nn.relu(_dense_apply(entry['du_0'], y))
        y = jax.nn.sigmoid(_dense_apply(entry['du_1'], y))
        if style == 'softmax':
            y = jax.nn.softmax(y, axis=-1)
    elif style == 'mini_concat':
        y = _dense_apply(entry['pre_concat'], y)
        y = jax.nn.relu(jnp.concatenate([y, meta], axis=-1))
        y = jax.nn.sigmoid(_dense_apply(entry['du_1'], y))
    elif style == 'extended_attention':
        for i in range(3):
            y = jnp.concatenate([y, meta], axis=-1)
            y = jax.nn.relu(_dense_apply(entry['feature_%d' % i], y))
        y = jax.nn.sigmoid(_dense_apply(entry['final'], y))
    else:
        raise NotImplementedError('Unknown QCALayer style %s' % style)
    return y


def _para_ca_apply(entry, meta, nonlinearity=True):
    """ParaCALayer math in f32 (models/q_layers.py:30-59).  ``nonlinearity`` mirrors
    the flax flag: relu between fc layers (True for QRCAB's q_node / QSAN's q_layer;
    QEDSR's per-block attention defaults False, ref attention_manipulators/
    architectures.py:332-356)."""
    n_fc = sum(1 for k in entry if k.startswith('fc_'))
    y = meta
    for i in range(n_fc):
        y = _dense_apply(entry['fc_%d' % i], y)
        if nonlinearity and i < n_fc - 1:
            y = jax.nn.relu(y)
    return jax.nn.sigmoid(y)


def _pa_apply(entry, h):
    """PALayer: two 1x1 convs + sigmoid gate, f32 (models/q_layers.py:62-76)."""
    def c1x1(e, z):
        dn = jax.lax.conv_dimension_numbers(z.shape, e['kernel'].shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(z, e['kernel'], (1, 1), 'VALID',
                                            dimension_numbers=dn) + e['bias']
    hf = h.astype(jnp.float32)
    y = jax.nn.relu(c1x1(entry['pa_0'], hf))
    y = jax.nn.sigmoid(c1x1(entry['pa_1'], y))
    return h * y.astype(h.dtype)


def _qrcan_float_forward(params, x, metadata, style, n_resgroups, n_resblocks,
                         track=None):
    """f32 QRCAN forward used for calibration (mirrors models/qmodels.py QRCAN;
    pa_node/q_node presence is read off the parameter tree)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)
    meta = jnp.asarray(metadata, jnp.float32)

    fconv = _fconv

    h = fconv(params['head'], tr('head', jnp.asarray(x, jnp.float32)))
    res = tr('_residual', h)
    for g in range(n_resgroups):
        grp = params['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['qrcab_%d' % b]
            pre = 'group_%d.qrcab_%d' % (g, b)
            y = jax.nn.relu(fconv(blk['conv_0'], tr(pre + '.conv_0', r)))
            y = fconv(blk['conv_1'], tr(pre + '.conv_1', y))
            att = _qca_apply(blk['qca'], jnp.mean(y, axis=(1, 2)), meta, style)
            y = y * att[:, None, None, :]
            if 'pa_node' in blk:
                y = _pa_apply(blk['pa_node'], y)
            if 'q_node' in blk:
                y = y * _para_ca_apply(blk['q_node'], meta)[:, None, None, :]
            r = tr('_residual', y + r)
        res = tr('_residual',
                 fconv(grp['final_body'], tr('group_%d.final_body' % g, r)) + res)
    res = fconv(params['final_body'], tr('final_body', res)) + h
    _check_rcan_upsampler_pow2(params['upsampler'])
    for i in range(sum(1 for k in params['upsampler'] if k.startswith('conv_'))):
        res = fconv(params['upsampler']['conv_%d' % i],
                    tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 2)
    return fconv(params['tail'], tr('tail', res))


def calibrate_qrcan_scales(params, sample_batches, metadata_batches, style='modulate',
                           n_resgroups=10, n_resblocks=20, margin=1.0):
    """Static activation scales for the int8 QRCAN forward (absmax calibration).

    ``metadata_batches`` must be the HANDLER-PREPARED metadata (key-masked, and
    scale_qpi-expanded for style='modulate') matching each sample batch.
    """
    track, maxes = _absmax_tracker()

    sample_batches = list(sample_batches)
    metadata_batches = list(metadata_batches)
    if not sample_batches:
        raise ValueError('calibrate_qrcan_scales: no calibration batches provided.')
    if len(sample_batches) != len(metadata_batches):
        raise ValueError('calibrate_qrcan_scales: %d sample batches but %d metadata '
                         'batches — zip would silently truncate the calibration set.'
                         % (len(sample_batches), len(metadata_batches)))
    for x, meta in zip(sample_batches, metadata_batches):
        _qrcan_float_forward(params, x, meta, style, n_resgroups, n_resblocks,
                             track=track)
    maxes.pop('_residual')
    return _finalize_scales(maxes, margin)


def qrcan_int8_forward_static(qparams, act_scales, x, metadata, style='modulate',
                              n_resgroups=10, n_resblocks=20,
                              residual_dtype='bfloat16'):
    """Quantized QRCAN forward: int8 convs + f32 meta-attention.

    The paper's flagship family: same static-scale int8 recipe as RCAN, with the
    QCALayer/PALayer/ParaCALayer attention stages (QRCAB, models/qmodels.py:18-44)
    computed in f32 on pooled vectors and re-applied as channel gates.  ``metadata``
    is the handler-prepared vector (scale_qpi-expanded for style='modulate').
    """
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16
    meta = jnp.asarray(metadata, jnp.float32)

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    h = qconv('head', qparams['head'], x).astype(carry_t)
    res = h
    for g in range(n_resgroups):
        grp = qparams['group_%d' % g]
        r = res
        for b in range(n_resblocks):
            blk = grp['qrcab_%d' % b]
            pre = 'group_%d.qrcab_%d' % (g, b)
            y = jax.nn.relu(qconv(pre + '.conv_0', blk['conv_0'], r))
            y = qconv(pre + '.conv_1', blk['conv_1'], y)
            att = _qca_apply(blk['qca'], jnp.mean(y, axis=(1, 2)).astype(jnp.float32),
                             meta, style)
            y = y * att[:, None, None, :]
            if 'pa_node' in blk:
                y = _pa_apply(blk['pa_node'], y)
            if 'q_node' in blk:
                y = y * _para_ca_apply(blk['q_node'], meta)[:, None, None, :]
            r = y.astype(carry_t) + r
        res = qconv('group_%d.final_body' % g, grp['final_body'], r).astype(carry_t) \
            + res
    res = qconv('final_body', qparams['final_body'], res) + h.astype(jnp.float32)
    _check_rcan_upsampler_pow2(qparams['upsampler'])
    for i in range(sum(1 for k in qparams['upsampler'] if k.startswith('conv_'))):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 2)
    return qconv('tail', qparams['tail'], res)


def quantize_qedsr_params(params, num_blocks=16):
    """Quantize a QEDSR parameter tree (models/qmodels.py naming) to int8.

    The EDSR conv spine (head, per-block conv_0/conv_1, final_body, upsampler,
    tail) goes int8; each block's ParaCALayer attention (a metadata-side Dense
    chain producing a per-channel sigmoid gate) stays f32."""
    q = _q_entry
    out = {'head': q(params['head']), 'final_body': q(params['final_body']),
           'tail': q(params['tail']),
           'upsampler': {k: q(v) for k, v in params['upsampler'].items()}}
    for i in range(num_blocks):
        blk = params['block_%d' % i]
        out['block_%d' % i] = {'conv_0': q(blk['conv_0']),
                               'conv_1': q(blk['conv_1']),
                               'attention': _f32_tree(blk['attention'])}
    return out


def _qedsr_float_forward(params, x, metadata, num_blocks, scale, res_scale,
                         nonlinearity=False, track=None):
    """f32 QEDSR forward used for calibration (mirrors models/qmodels.py QEDSR:
    EDSR spine + per-block ParaCALayer gate applied AFTER the res_scale multiply,
    ref attention_manipulators/architectures.py:332-399)."""
    from ..models.blocks import pixel_shuffle

    tr = track or (lambda name, h: h)
    meta = jnp.asarray(metadata, jnp.float32)

    h = _fconv(params['head'], tr('head', jnp.asarray(x, jnp.float32)))
    res = tr('_residual', h)
    for i in range(num_blocks):
        blk = params['block_%d' % i]
        y = jax.nn.relu(_fconv(blk['conv_0'], tr('block_%d.conv_0' % i, res)))
        y = _fconv(blk['conv_1'], tr('block_%d.conv_1' % i, y))
        y = y * res_scale
        gate = _para_ca_apply(blk['attention'], meta, nonlinearity=nonlinearity)
        y = y * (gate if gate.ndim == y.ndim else gate[:, None, None, :])
        res = tr('_residual', y + res)
    res = _fconv(params['final_body'], tr('final_body', res)) + h
    n_up = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
    for i in range(n_up):
        res = _fconv(params['upsampler']['conv_%d' % i],
                     tr('upsampler.conv_%d' % i, res))
        res = pixel_shuffle(res, 3 if scale == 3 else 2)
    return _fconv(params['tail'], tr('tail', res))


def calibrate_qedsr_scales(params, sample_batches, metadata_batches, num_blocks=16,
                           scale=4, res_scale=0.1, nonlinearity=False, margin=1.0):
    """Static activation scales for the int8 QEDSR forward (absmax calibration).

    ``metadata_batches`` must be the HANDLER-PREPARED metadata (key-masked)
    matching each sample batch."""
    track, maxes = _absmax_tracker()

    sample_batches = list(sample_batches)
    metadata_batches = list(metadata_batches)
    if not sample_batches:
        raise ValueError('calibrate_qedsr_scales: no calibration batches provided.')
    if len(sample_batches) != len(metadata_batches):
        raise ValueError('calibrate_qedsr_scales: %d sample batches but %d metadata '
                         'batches — zip would silently truncate the calibration set.'
                         % (len(sample_batches), len(metadata_batches)))
    for x, meta in zip(sample_batches, metadata_batches):
        _qedsr_float_forward(params, x, meta, num_blocks, scale, res_scale,
                             nonlinearity, track=track)
    maxes.pop('_residual')
    return _finalize_scales(maxes, margin)


def qedsr_int8_forward_static(qparams, act_scales, x, metadata, num_blocks=16,
                              scale=4, res_scale=0.1, nonlinearity=False,
                              residual_dtype='bfloat16'):
    """Quantized QEDSR forward: int8 EDSR conv spine + f32 ParaCALayer gates.

    Same static-scale recipe as EDSR; the per-block meta-gate (a Dense chain on
    the (B, M) metadata vector — no image-sized f32 tensors) re-applies as a
    per-channel scale on the int8 conv output (ref attention_manipulators/
    architectures.py:332-399)."""
    from ..models.blocks import pixel_shuffle

    if residual_dtype not in ('float32', 'bfloat16'):
        raise ValueError('residual_dtype must be float32 | bfloat16')
    carry_t = jnp.float32 if residual_dtype == 'float32' else jnp.bfloat16
    meta = jnp.asarray(metadata, jnp.float32)

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    h = qconv('head', qparams['head'], x).astype(carry_t)
    res = h
    for i in range(num_blocks):
        blk = qparams['block_%d' % i]
        y = jax.nn.relu(qconv('block_%d.conv_0' % i, blk['conv_0'], res))
        y = qconv('block_%d.conv_1' % i, blk['conv_1'], y)
        gate = _para_ca_apply(blk['attention'], meta, nonlinearity=nonlinearity)
        y = (y * res_scale) * (gate if gate.ndim == y.ndim
                               else gate[:, None, None, :])
        res = y.astype(carry_t) + res
    res = qconv('final_body', qparams['final_body'], res) + h.astype(jnp.float32)
    n_up = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
    for i in range(n_up):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 3 if scale == 3 else 2)
    return qconv('tail', qparams['tail'], res)


def _edsr_int8_forward_res16(qparams, act_scales, x, num_blocks, scale, res_scale):
    """int16 fixed-point residual datapath (see edsr_int8_forward_static)."""
    from ..models.blocks import pixel_shuffle

    if 'residual16' not in act_scales:
        raise KeyError("act_scales has no 'residual16' entry — re-run "
                       "calibrate_edsr_scales (older calibration dicts predate the "
                       "int16 residual datapath).")
    s_res = jnp.float32(act_scales['residual16'])

    def to_i8(h_i16, x_scale):
        # requantize the int16 residual stream straight to the conv's int8 input grid
        q = jnp.round(h_i16.astype(jnp.float32) * (s_res / x_scale))
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    def qconv_i8(name, tree, x_q):
        return conv_int8(x_q, tree['kernel'], tree['scale'],
                         bias=tree['bias'], x_scale=act_scales[name])

    def qconv(name, tree, h):
        return conv_int8_static(h, tree['kernel'], tree['scale'], act_scales[name],
                                tree['bias'])

    def to_i16(h_f32):
        return jnp.clip(jnp.round(h_f32 / s_res), -32767, 32767).astype(jnp.int16)

    h16 = to_i16(qconv('head', qparams['head'], x))
    res16 = h16
    for i in range(num_blocks):
        blk = qparams['block_%d' % i]
        x_q = to_i8(res16, act_scales['block_%d.conv_0' % i])
        y = jax.nn.relu(qconv_i8('block_%d.conv_0' % i, blk['conv_0'], x_q))
        y = qconv('block_%d.conv_1' % i, blk['conv_1'], y)
        # accumulate in the int16 grid: res16 += round(y * res_scale / s_res)
        delta = jnp.round(y * (res_scale / s_res)).astype(jnp.int32)
        res16 = jnp.clip(res16.astype(jnp.int32) + delta,
                         -32767, 32767).astype(jnp.int16)
    bt_in = to_i8(res16, act_scales['body_tail'])
    res = qconv_i8('body_tail', qparams['body_tail'], bt_in) \
        + h16.astype(jnp.float32) * s_res
    n_up = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
    for i in range(n_up):
        res = qconv('upsampler.conv_%d' % i, qparams['upsampler']['conv_%d' % i], res)
        res = pixel_shuffle(res, 3 if scale == 3 else 2)
    return qconv('tail', qparams['tail'], res)
