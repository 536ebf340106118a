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


def _timed(loop_fn, x):
    float(np.asarray(loop_fn(x)))  # compile + first run
    t0 = time.perf_counter()
    float(np.asarray(loop_fn(x)))  # host transfer = real barrier
    return x.shape[0] / ((time.perf_counter() - t0) / ITERS)


def _make_loop(apply_fn, to_carry=None):
    """fori_loop timing body; ``to_carry`` maps the model output back to the
    input shape (default: 4x-downsample a same-channel output)."""
    if to_carry is None:
        to_carry = lambda y, c: (y[:, ::4, ::4, :] * 0.999).astype(c.dtype)

    @jax.jit
    def loop(x):
        def body(i, carry):
            y = apply_fn(carry)
            return to_carry(y, carry)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))
    return loop


def _fid(out, ref):
    """Fidelity of the quantized output vs the f32 model, in dB."""
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    return 10 * np.log10(1.0 / max(float((err ** 2).mean()), 1e-12))


def _serving_x(channels=3, hw=128, seed=0, batch=BATCH):
    return jnp.asarray(np.random.RandomState(seed).rand(batch, hw, hw, channels),
                       jnp.float32)


def _rcan_section():
    from ..models.advanced import RCAN
    from ..ops.quantization import (calibrate_rcan_scales, quantize_rcan_params,
                                    rcan_int8_forward_static)

    x = _serving_x()
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


def _han_section():
    from ..models.advanced import HAN
    from ..ops.quantization import (calibrate_han_scales, quantize_han_params,
                                    han_int8_forward_static)

    x = _serving_x()
    model = HAN(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(2), x)
    f32_model = HAN()
    qparams = quantize_han_params(variables['params'])
    scales = calibrate_han_scales(variables['params'], [np.asarray(x[:2])])
    ref = np.asarray(f32_model.apply(variables, x[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h)), x)
    print('han bf16 model            : %8.1f img/s' % bf16_tput)
    # xla epilogue only: the pallas CA+residual epilogue is archived (0.47x e2e
    # on int8 RCAN — see ops/pallas/channel_attention.py) and VMEM-OOMs at
    # batch 16 besides
    fwd = lambda h: han_int8_forward_static(qparams, scales, h)
    tput = _timed(_make_loop(fwd), x)
    err = np.abs(np.asarray(fwd(x[:1])) - ref)
    fid = 10 * np.log10(1.0 / max(float((err ** 2).mean()), 1e-12))
    print('han int8 static, bf16 res : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, fid))


def _qrcan_section():
    from ..models.qmodels import QRCAN
    from ..ops.quantization import (calibrate_qrcan_scales, quantize_qrcan_params,
                                    qrcan_int8_forward_static)

    x = _serving_x()
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


def _edsr_section():
    from ..models.advanced import EDSR
    from ..ops.quantization import (calibrate_edsr_scales, edsr_int8_forward_static,
                                    quantize_edsr_params)

    nb = 16
    x = _serving_x()
    model = EDSR(net_features=64, num_blocks=nb, scale=4, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    f32_model = EDSR(net_features=64, num_blocks=nb, scale=4)

    qparams = quantize_edsr_params(variables['params'])
    scales = calibrate_edsr_scales(variables['params'], [np.asarray(x[:2])],
                                   num_blocks=nb, scale=4)
    ref = np.asarray(f32_model.apply(variables, x[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h)), x)
    print('edsr bf16 model           : %8.1f img/s' % bf16_tput)
    for dtype in ('float32', 'bfloat16', 'int16'):
        fwd = lambda h, d=dtype: edsr_int8_forward_static(
            qparams, scales, h, num_blocks=nb, scale=4, residual_dtype=d)
        tput = _timed(_make_loop(fwd), x)
        print('edsr int8, %-9s res  : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
              % (dtype, tput, tput / bf16_tput, _fid(fwd(x[:1]), ref)))


def _vdsr_section():
    """VDSR serves the pre-upscaled 512 input (im_input='interp', y-only)."""
    from ..models.basic import VDSR
    from ..ops.quantization import (calibrate_vdsr_scales, quantize_vdsr_params,
                                    vdsr_int8_forward_static)

    x = _serving_x(channels=1, hw=512, seed=3)
    model = VDSR(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(3), x[:1])
    qparams = quantize_vdsr_params(variables['params'])
    scales = calibrate_vdsr_scales(variables['params'], [np.asarray(x[:2])])
    ref = np.asarray(VDSR().apply(variables, x[:1]))

    same = lambda y, c: (y * 0.999).astype(c.dtype)  # same-resolution output
    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h), same), x)
    print('vdsr bf16 model  (512-in) : %8.1f img/s' % bf16_tput)
    fwd = lambda h: vdsr_int8_forward_static(qparams, scales, h)
    tput = _timed(_make_loop(fwd, same), x)
    print('vdsr int8 static          : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1]), ref)))


def _srmd_section():
    """SRMD consumes the RGB + 15 metadata-map concat input (in_nc=18)."""
    from ..models.advanced import SRMD
    from ..ops.quantization import (calibrate_srmd_scales, quantize_srmd_params,
                                    srmd_int8_forward_static)

    x = _serving_x(channels=18, seed=4)
    model = SRMD(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(4), x[:1])
    qparams = quantize_srmd_params(variables['params'])
    scales = calibrate_srmd_scales(variables['params'], [np.asarray(x[:2])], 4)
    ref = np.asarray(SRMD().apply(variables, x[:1]))

    # 3-channel HR output -> tile back to the 18-channel augmented input
    carry = lambda y, c: jnp.tile(y[:, ::4, ::4, :] * 0.999,
                                  (1, 1, 1, 6)).astype(c.dtype)
    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h), carry), x)
    print('srmd bf16 model           : %8.1f img/s' % bf16_tput)
    fwd = lambda h: srmd_int8_forward_static(qparams, scales, h, 4)
    tput = _timed(_make_loop(fwd, carry), x)
    print('srmd int8 static          : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1]), ref)))


def _sftmd_section():
    from ..models.sftmd import SFTMD
    from ..ops.quantization import (calibrate_sftmd_scales, quantize_sftmd_params,
                                    sftmd_int8_forward_static)

    x = _serving_x(seed=5)
    meta = jnp.asarray(np.random.RandomState(15).rand(BATCH, 10), jnp.float32)
    model = SFTMD(input_para=10, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(5), x[:1], meta[:1])
    qparams = quantize_sftmd_params(variables['params'])
    scales = calibrate_sftmd_scales(variables['params'], [np.asarray(x[:2])],
                                    [np.asarray(meta[:2])])
    ref = np.asarray(SFTMD(input_para=10).apply(variables, x[:1], meta[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h, meta)), x)
    print('sftmd bf16 model          : %8.1f img/s' % bf16_tput)
    fwd = lambda h, m=meta: sftmd_int8_forward_static(qparams, scales, h, m)
    tput = _timed(_make_loop(fwd), x)
    print('sftmd int8 static         : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1], meta[:1]), ref)))


def _san_section():
    from ..models.san import SAN
    from ..ops.quantization import (calibrate_san_scales, quantize_san_params,
                                    san_int8_forward_static)

    x = _serving_x(seed=6)
    model = SAN(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(6), x[:1])
    qparams = quantize_san_params(variables['params'])
    scales = calibrate_san_scales(variables['params'], [np.asarray(x[:2])])
    ref = np.asarray(SAN().apply(variables, x[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h)), x)
    print('san bf16 model            : %8.1f img/s' % bf16_tput)
    fwd = lambda h: san_int8_forward_static(qparams, scales, h)
    tput = _timed(_make_loop(fwd), x)
    print('san int8 static           : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1]), ref)))


def _qsan_section():
    from ..models.qmodels import QSAN
    from ..ops.quantization import (calibrate_qsan_scales, quantize_qsan_params,
                                    qsan_int8_forward_static)

    x = _serving_x(seed=7)
    meta = jnp.asarray(np.random.RandomState(17).rand(BATCH, 10), jnp.float32)
    model = QSAN(input_para=10, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(7), x[:1], meta[:1])
    qparams = quantize_qsan_params(variables['params'])
    scales = calibrate_qsan_scales(variables['params'], [np.asarray(x[:2])],
                                   [np.asarray(meta[:2])])
    ref = np.asarray(QSAN(input_para=10).apply(variables, x[:1], meta[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h, meta)), x)
    print('qsan bf16 model           : %8.1f img/s' % bf16_tput)
    fwd = lambda h, m=meta: qsan_int8_forward_static(qparams, scales, h, m)
    tput = _timed(_make_loop(fwd), x)
    print('qsan int8 static          : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1], meta[:1]), ref)))


def _qedsr_section():
    from ..models.qmodels import QEDSR
    from ..ops.quantization import (calibrate_qedsr_scales, quantize_qedsr_params,
                                    qedsr_int8_forward_static)

    x = _serving_x(seed=8)
    meta = jnp.asarray(np.random.RandomState(18).rand(BATCH, 10), jnp.float32)
    model = QEDSR(input_para=10, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(8), x[:1], meta[:1])
    qparams = quantize_qedsr_params(variables['params'])
    scales = calibrate_qedsr_scales(variables['params'], [np.asarray(x[:2])],
                                    [np.asarray(meta[:2])])
    ref = np.asarray(QEDSR(input_para=10).apply(variables, x[:1], meta[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h, meta)), x)
    print('qedsr bf16 model          : %8.1f img/s' % bf16_tput)
    fwd = lambda h, m=meta: qedsr_int8_forward_static(qparams, scales, h, m)
    tput = _timed(_make_loop(fwd), x)
    print('qedsr int8 static         : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1], meta[:1]), ref)))


def _qhan_section():
    from ..models.qmodels import QHAN
    from ..ops.quantization import (calibrate_qhan_scales, quantize_qhan_params,
                                    qhan_int8_forward_static)

    x = _serving_x(seed=9)
    meta = jnp.asarray(np.random.RandomState(19).rand(BATCH, 10), jnp.float32)
    model = QHAN(num_metadata=10, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(9), x[:1], meta[:1])
    qparams = quantize_qhan_params(variables['params'])
    scales = calibrate_qhan_scales(variables['params'], [np.asarray(x[:2])],
                                   [np.asarray(meta[:2])])
    ref = np.asarray(QHAN(num_metadata=10).apply(variables, x[:1], meta[:1]))

    bf16_tput = _timed(_make_loop(lambda h: model.apply(variables, h, meta)), x)
    print('qhan bf16 model           : %8.1f img/s' % bf16_tput)
    fwd = lambda h, m=meta: qhan_int8_forward_static(qparams, scales, h, m)
    tput = _timed(_make_loop(fwd), x)
    print('qhan int8 static          : %8.1f img/s  (%.2fx bf16, %4.1f dB vs f32)'
          % (tput, tput / bf16_tput, _fid(fwd(x[:1], meta[:1]), ref)))


SECTIONS = {
    'edsr': _edsr_section, 'rcan': _rcan_section, 'han': _han_section,
    'qrcan': _qrcan_section, 'vdsr': _vdsr_section, 'srmd': _srmd_section,
    'sftmd': _sftmd_section, 'san': _san_section, 'qsan': _qsan_section,
    'qedsr': _qedsr_section, 'qhan': _qhan_section,
}


def main(argv=None):
    """Default: the round-3 quartet (edsr/rcan/han/qrcan).  Pass family names
    to select sections, or ``--all`` for every int8-covered family."""
    import sys as _sys
    args = list(_sys.argv[1:] if argv is None else argv)
    if '--all' in args:
        names = list(SECTIONS)
    elif args:
        unknown = set(args) - set(SECTIONS)
        if unknown:
            _sys.exit('unknown families: %s (choose from: %s)'
                      % (', '.join(sorted(unknown)), ', '.join(SECTIONS)))
        names = [a for a in args if a in SECTIONS]
    else:
        names = ['edsr', 'rcan', 'han', 'qrcan']
    for name in names:
        SECTIONS[name]()


if __name__ == '__main__':
    main()
