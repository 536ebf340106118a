"""Microbenchmark for the int8 serving path (run on a real TPU chip).

Compares the bf16 EDSR forward against the static-int8 forward with each
residual-carry datapath (f32 / bf16 / int16) on the headline serving workload
(EDSR 64f/16b, 4x, 128->512).  Timing runs inside one jitted program (in-graph
``lax.fori_loop`` with a data dependency between iterations + a host transfer as
the barrier) because ``block_until_ready`` returns early through this platform's
remote-execution tunnel.

Run: ``python -m sisr_tpu.tools.bench_quantization``
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


BATCH, ITERS = 16, 20


def _timed(loop_fn, *args):
    float(np.asarray(loop_fn(*args)))  # compile + first run
    t0 = time.perf_counter()
    float(np.asarray(loop_fn(*args)))  # host transfer = real barrier
    return BATCH / ((time.perf_counter() - t0) / ITERS)


def _make_loop(apply_fn):
    @jax.jit
    def loop(x):
        def body(i, carry):
            y = apply_fn(carry)
            return (y[:, ::4, ::4, :] * 0.999).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))
    return loop


def _rcan_section(x):
    from ..models.advanced import RCAN
    from ..ops.quantization import (calibrate_rcan_scales, quantize_rcan_params,
                                    rcan_int8_forward_static)

    model = RCAN(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(1), x)
    f32_model = RCAN()
    qparams = quantize_rcan_params(variables['params'])
    scales = calibrate_rcan_scales(variables['params'], [np.asarray(x[:2])])
    ref = np.asarray(f32_model.apply(variables, x[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h)), x)
    print('rcan bf16 model           : %8.1f img/s' % bf16_tput)
    fwd = lambda h: rcan_int8_forward_static(qparams, scales, h)
    tput = _timed(_make_loop(fwd), x)
    err = np.abs(np.asarray(fwd(x[:1])) - ref)
    fid = 10 * np.log10(1.0 / max(float((err ** 2).mean()), 1e-12))
    print('rcan int8 static, bf16 res: %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, fid))


def _han_section(x):
    from ..models.advanced import HAN
    from ..ops.quantization import (calibrate_han_scales, quantize_han_params,
                                    han_int8_forward_static)

    model = HAN(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(2), x)
    f32_model = HAN()
    qparams = quantize_han_params(variables['params'])
    scales = calibrate_han_scales(variables['params'], [np.asarray(x[:2])])
    ref = np.asarray(f32_model.apply(variables, x[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h)), x)
    print('han bf16 model            : %8.1f img/s' % bf16_tput)
    for epi in ('xla', 'pallas'):
        fwd = lambda h, e=epi: han_int8_forward_static(qparams, scales, h,
                                                       ca_epilogue=e)
        tput = _timed(_make_loop(fwd), x)
        err = np.abs(np.asarray(fwd(x[:1])) - ref)
        fid = 10 * np.log10(1.0 / max(float((err ** 2).mean()), 1e-12))
        print('han int8 %-6s, bf16 res: %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
              % (epi, tput, tput / bf16_tput, fid))


def _qrcan_section(x):
    from ..models.qmodels import QRCAN
    from ..ops.quantization import (calibrate_qrcan_scales, quantize_qrcan_params,
                                    qrcan_int8_forward_static)

    cfg = dict(n_resgroups=10, n_resblocks=20, n_feats=64, scale=4,
               style='max_concat', num_metadata=10, include_q_layer=True)
    model = QRCAN(dtype=jnp.bfloat16, **cfg)
    meta = jnp.asarray(np.random.rand(x.shape[0], 10), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, metadata=meta)
    f32_model = QRCAN(**cfg)
    qparams = quantize_qrcan_params(variables['params'])
    scales = calibrate_qrcan_scales(variables['params'], [np.asarray(x[:2])],
                                    [np.asarray(meta[:2])], style='max_concat')
    ref = np.asarray(f32_model.apply(variables, x[:1], metadata=meta[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h,
                                                        metadata=meta)), x)
    print('qrcan bf16 model           : %8.1f img/s' % bf16_tput)
    fwd = lambda h, m: qrcan_int8_forward_static(qparams, scales, h, m,
                                                 style='max_concat')
    tput = _timed(_make_loop(lambda h: fwd(h, meta)), x)
    err = np.abs(np.asarray(fwd(x[:1], meta[:1])) - ref)
    fid = 10 * np.log10(1.0 / max(float((err ** 2).mean()), 1e-12))
    print('qrcan int8 static, bf16 res: %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, fid))


def main():
    from ..models.advanced import EDSR
    from ..ops.quantization import (calibrate_edsr_scales, edsr_int8_forward_static,
                                    quantize_edsr_params)

    nb = 16
    model = EDSR(net_features=64, num_blocks=nb, scale=4, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.rand(BATCH, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    f32_model = EDSR(net_features=64, num_blocks=nb, scale=4)

    qparams = quantize_edsr_params(variables['params'])
    scales = calibrate_edsr_scales(variables['params'], [np.asarray(x[:2])],
                                   num_blocks=nb, scale=4)
    ref = np.asarray(f32_model.apply(variables, x[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h)), x)
    print('bf16 model                : %8.1f img/s' % bf16_tput)
    for dtype in ('float32', 'bfloat16', 'int16'):
        fwd = lambda h, d=dtype: edsr_int8_forward_static(
            qparams, scales, h, num_blocks=nb, scale=4, residual_dtype=d)
        tput = _timed(_make_loop(fwd), x)
        err = np.abs(np.asarray(fwd(x[:1])) - ref)
        fid = 10 * np.log10(1.0 / max(float((err ** 2).mean()), 1e-12))
        print('int8 static, %-9s res: %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
              % (dtype, tput, tput / bf16_tput, fid))

    _rcan_section(x)
    _han_section(x)
    _qrcan_section(x)


if __name__ == '__main__':
    main()
