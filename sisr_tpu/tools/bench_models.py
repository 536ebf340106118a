"""Per-family serving-throughput table on a real TPU chip.

Runs each model family at its reference default size on the headline serving
workload (4x SR, 128->512 — interp-input models consume the pre-upscaled 512
input) in bfloat16 and prints img/s per chip.  Same in-graph ``lax.fori_loop``
timing discipline as bench.py (``block_until_ready`` returns early through this
platform's remote-execution tunnel).

Run: ``python -m sisr_tpu.tools.bench_models [family ...]``
(default: every family; e.g. ``... bench_models edsr rcan qrcan``).

``--e2e``: instead of forward-only loops, measure the BASELINE benchmark configs
#1-#5 (srcnn/edsr/qrcan/san/sparnet — see tools/e2e_bench.py) through the REAL
product eval protocol (decode -> prep -> forward -> YCbCr -> PSNR/SSIM -> CSV),
in img/s per chip: ``python -m sisr_tpu.tools.bench_models --e2e [config ...]``.

``--train``: end-to-end training-epoch throughput (decode + crops + prefetch +
jitted fwd/bwd/adam) for EDSR 64f/16b; add ``--fused-dispatch`` for the 8-step
lax.scan dispatch and ``--vs-torch`` for the torch-CPU train-step baseline.

``--paper``: PAPER-scale (flagship) forward benchmarks with MFU — EDSR at the SPL
recipe size (256f/32b) and RCAN/QRCAN at the SPL 10x20x64 config, bf16 + int8
(``--no-int8`` to skip the quantized rows; compile is several minutes per row
over the tunnel).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH, ITERS, LR = 16, 10, 128


def _timed(apply_fn, x, out_hw):
    stride = out_hw // x.shape[1]

    @jax.jit
    def loop(h):
        def body(i, carry):
            y = apply_fn(carry)
            return (y[:, ::stride, ::stride, :] * 0.999).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, h))

    float(np.asarray(loop(x)))
    t0 = time.perf_counter()
    float(np.asarray(loop(x)))
    return BATCH / ((time.perf_counter() - t0) / ITERS)


def _families():
    from ..models import advanced, basic, qmodels, san, sftmd, sparnet

    bf = jnp.bfloat16
    # name -> thunk returning (module, input-size, metadata-or-None); lazy so
    # benchmarking one family never constructs the others or touches the device.
    # Sizes are reference defaults: srcnn/vdsr consume the pre-upscaled 512 input
    # (im_input='interp'); sparnet runs its native 128-face workload; the rest are
    # true 4x 128->512.
    return [
        ('srcnn', lambda: (basic.SRCNN(channel_pattern=[3, 64, 32, 3], dtype=bf),
                           512, None)),
        ('vdsr', lambda: (basic.VDSR(channel_pattern=[3] + [64] * 19 + [3],
                                     kernel_pattern=[3] * 20, dtype=bf), 512, None)),
        ('edsr', lambda: (advanced.EDSR(dtype=bf), LR, None)),
        ('rcan', lambda: (advanced.RCAN(dtype=bf), LR, None)),
        ('han', lambda: (advanced.HAN(dtype=bf), LR, None)),
        ('san', lambda: (san.SAN(dtype=bf), LR, None)),
        ('srmd', lambda: (advanced.SRMD(dtype=bf), LR, 'pad15')),
        ('sftmd', lambda: (sftmd.SFTMD(input_para=10, dtype=bf), LR,
                           jnp.zeros((BATCH, LR, LR, 10), jnp.float32))),
        ('sparnet', lambda: (sparnet.SPARNet(dtype=bf), 128, None)),
        ('qrcan', lambda: (qmodels.QRCAN(style='modulate', num_metadata=1,
                                         include_q_layer=True, dtype=bf), LR,
                           jnp.zeros((BATCH, 1), jnp.float32))),
        ('qedsr', lambda: (qmodels.QEDSR(input_para=1, dtype=bf), LR,
                           jnp.zeros((BATCH, 1), jnp.float32))),
    ]


def main_e2e(only):
    from .e2e_bench import E2E_CONFIGS, run_config
    keys = [k for k in E2E_CONFIGS if not only or k in only]
    unknown = only - set(E2E_CONFIGS)
    if unknown:
        sys.exit('unknown e2e configs: %s (choose from: %s)'
                 % (', '.join(sorted(unknown)), ', '.join(E2E_CONFIGS)))
    print('%-9s %10s  %s' % ('config', 'img/s', '(end-to-end eval protocol, '
                             '32 images, batch 8)'))
    for key in keys:
        try:
            tput = run_config(key)
            print('%-9s %10.2f' % (key, tput))
        except Exception as e:
            print('%-9s %10s  (%s: %s)' % (key, 'FAILED', type(e).__name__,
                                           str(e)[:60]))


def main_paper(args):
    """PAPER-scale (flagship) forward benchmarks with MFU, on the real chip.

    Rows: EDSR at the SPL recipe size (256 feats / 32 blocks — ref
    Documentation/sample_config_files/div2k/edsr.toml:43-57) and RCAN/QRCAN at the
    SPL 10 groups x 20 blocks x 64 feats config, bf16 and (where serving-relevant)
    int8.  The dev-size table above is MXU-lane-limited at C=64; these are the
    flagship-size figures the paper recipe actually runs at.
    """
    import time as _t
    from .flops import (edsr_flops_per_image, qrcan_flops_per_image,
                        rcan_flops_per_image)
    peak = float(__import__('os').environ.get('BENCH_PEAK_TFLOPS', '197')) * 1e12
    rng = jax.random.PRNGKey(0)
    rows = []

    def timed(fn, x, out_stride=4, iters=5):
        @jax.jit
        def loop(h):
            def body(i, carry):
                y = fn(carry)
                return (y[:, ::out_stride, ::out_stride, :] * 0.999).astype(carry.dtype)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, h))
        float(np.asarray(loop(x)))
        t0 = _t.perf_counter()
        float(np.asarray(loop(x)))
        return x.shape[0] / ((_t.perf_counter() - t0) / iters)

    # --- EDSR 256f/32b (batch 16: measured ~7% better MXU utilization than 8 —
    # 92.5 vs 86.6 img/s; batch 12 tiles poorly at 58.7% — and the 1024-ch
    # upsampler maps at 256^2 fit comfortably, ~2.1 GB bf16)
    from ..models.advanced import EDSR, RCAN
    fl_e = edsr_flops_per_image(feats=256, blocks=32)
    xp = jnp.asarray(np.random.rand(16, LR, LR, 3), jnp.float32)
    model = EDSR(net_features=256, num_blocks=32, scale=4, dtype=jnp.bfloat16)
    variables = model.init(rng, xp)
    bf16_e = timed(lambda h: model.apply(variables, h), xp)
    rows.append(('edsr 256f/32b bf16', bf16_e, fl_e / 1e9, bf16_e * fl_e / peak, None))

    if '--no-int8' not in args:
        from ..ops.quantization import (calibrate_edsr_scales,
                                        edsr_int8_forward_static,
                                        quantize_edsr_params)
        qp = quantize_edsr_params(variables['params'])
        scales = calibrate_edsr_scales(variables['params'], [np.asarray(xp[:2])],
                                       num_blocks=32)
        int8_e = timed(lambda h: edsr_int8_forward_static(
            qp, scales, h, num_blocks=32, residual_dtype='bfloat16'), xp)
        rows.append(('edsr 256f/32b int8', int8_e, fl_e / 1e9, None, int8_e / bf16_e))

    # --- RCAN / QRCAN at the SPL config (their defaults ARE the paper size)
    fl_r = rcan_flops_per_image()
    x16 = jnp.asarray(np.random.rand(16, LR, LR, 3), jnp.float32)
    rcan = RCAN(dtype=jnp.bfloat16)
    vr = rcan.init(rng, x16)
    bf16_r = timed(lambda h: rcan.apply(vr, h), x16)
    rows.append(('rcan 10x20x64 bf16', bf16_r, fl_r / 1e9, bf16_r * fl_r / peak, None))
    if '--no-int8' not in args:
        from ..ops.quantization import (calibrate_rcan_scales, quantize_rcan_params,
                                        rcan_int8_forward_static)
        qp = quantize_rcan_params(vr['params'])
        scales = calibrate_rcan_scales(vr['params'], [np.asarray(x16[:2])])
        int8_r = timed(lambda h: rcan_int8_forward_static(
            qp, scales, h, residual_dtype='bfloat16'), x16)
        rows.append(('rcan 10x20x64 int8', int8_r, fl_r / 1e9, None, int8_r / bf16_r))

    from ..models import qmodels
    qrcan = qmodels.QRCAN(style='modulate', num_metadata=1, include_q_layer=True,
                          dtype=jnp.bfloat16)
    meta = jnp.zeros((16, 1), jnp.float32)
    vq = qrcan.init(rng, x16, meta)
    bf16_q = timed(lambda h: qrcan.apply(vq, h, meta), x16)
    fl_q = qrcan_flops_per_image()  # +ParaCA meta-MLP terms (ppm-level, but its own model)
    rows.append(('qrcan SPL bf16', bf16_q, fl_q / 1e9, bf16_q * fl_q / peak, None))

    print('%-20s %9s %11s %7s %8s   (4x 128->512; MFU at %.0f bf16 peak TFLOP/s)'
          % ('config', 'img/s', 'GFLOP/img', 'MFU', 'vs bf16', peak / 1e12))
    for name, tput, gf, mfu, ratio in rows:
        print('%-20s %9.1f %11.1f %7s %8s'
              % (name, tput, gf,
                 '—' if mfu is None else '%.1f%%' % (100 * mfu),
                 '—' if ratio is None else '%.2fx' % ratio))


def main_train(args):
    from .e2e_bench import measure_train_torch, run_train_bench
    k = 8 if '--fused-dispatch' in args else 1
    cache = '--cache' in args
    tput = run_train_bench(steps_per_dispatch=k, cache_decoded=cache)
    print('train epoch throughput (EDSR 64f/16b, crop 32, batch 8%s%s): %.2f img/s'
          % (', 8-step fused dispatch' if k > 1 else '',
             ', decoded-image cache' if cache else '', tput))
    if '--vs-torch' in args:
        torch_tput = measure_train_torch()
        print('torch-CPU train-step baseline (same model/batch/crop): %.2f img/s '
              '(%.1fx)' % (torch_tput, tput / torch_tput))


def main_val():
    from .e2e_bench import run_val_bench
    std, fused = run_val_bench()
    print('validation epoch throughput (EDSR 64f/16b, 4x 128->512, batch 4): '
          'standard %.2f img/s | fused_val %.2f img/s (%.2fx)'
          % (std, fused, fused / std))


def main():
    args = sys.argv[1:]
    if '--paper' in args:
        return main_paper(set(args))
    if '--val' in args:
        return main_val()
    if '--train' in args:
        return main_train(set(args))
    if '--e2e' in args:
        return main_e2e({a for a in args if a != '--e2e'})
    only = set(args)
    known = {name for name, _ in _families()}
    unknown = only - known
    if unknown:
        sys.exit('unknown families: %s (choose from: %s)'
                 % (', '.join(sorted(unknown)), ', '.join(sorted(known))))
    rng = jax.random.PRNGKey(0)
    print('%-9s %10s  %s' % ('family', 'img/s', '(bf16, batch %d, 4x 128->512)'
                             % BATCH))
    for name, make in _families():
        if only and name not in only:
            continue
        model, in_size, meta = make()
        x = jnp.asarray(np.random.rand(BATCH, in_size, in_size, 3), jnp.float32)
        try:
            if meta is None:
                variables = model.init(rng, x)
                fn = lambda h: model.apply(variables, h)
            elif isinstance(meta, str) and meta == 'pad15':
                # SRMD consumes RGB ++ 15 per-pixel degradation maps as one input
                def pad(h):
                    z = jnp.zeros(h.shape[:3] + (15,), h.dtype)
                    return jnp.concatenate([h, z], axis=-1)
                variables = model.init(rng, pad(x))
                fn = lambda h: model.apply(variables, pad(h))
            else:
                variables = model.init(rng, x, meta)
                fn = lambda h: model.apply(variables, h, meta)
            out = jax.eval_shape(fn, x).shape
            tput = _timed(fn, x, out[1])
            print('%-9s %10.1f' % (name, tput))
        except Exception as e:  # keep the table going; report the failure
            print('%-9s %10s  (%s: %s)' % (name, 'FAILED', type(e).__name__,
                                           str(e)[:60]))


if __name__ == '__main__':
    main()
