"""Headline benchmark: END-TO-END eval-protocol throughput for the BASELINE workload —
4x SR 128->512 with EDSR 64f/16b through the real product path (`EvalHub
.full_image_protocol`: PNG decode -> LR bicubic prep -> jitted forward -> YCbCr ->
PSNR/SSIM -> CSV report), in images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the SAME protocol with the reference's engine choices:
torch-CPU EDSR forward + host (skimage-equivalent) metrics, measured on this machine
(cached in the untracked .bench_baseline.json; re-measure with
BENCH_MEASURE_BASELINE=1).  Driver target (BASELINE.md): >10x per v5e chip.

Forward-only device throughput (the round-1 headline) is still measured and printed to
stderr for the record.  The other BASELINE configs (srcnn interp / q-RCAN metadata /
tiled SAN / SPARNet face) run through the same protocol via
``python -m sisr_tpu.tools.bench_models --e2e``; forward-only per-family numbers via
``python -m sisr_tpu.tools.bench_models``.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from sisr_tpu.tools.e2e_bench import (E2E_CONFIGS, build_experiment, build_workload,
                                      log, measure_e2e)

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '.bench_baseline.json')
BATCH = int(os.environ.get('BENCH_BATCH', '8'))
N_IMAGES = int(os.environ.get('BENCH_IMAGES', '32'))
ITERS = int(os.environ.get('BENCH_ITERS', '20'))


def measure_e2e_torch(lr_dir, hr_dir):
    """The same protocol with the reference's engines: torch-CPU EDSR forward +
    host metrics (skimage-equivalent SSIM), shared decode/prep/colorspace code."""
    import torch
    from PIL import Image
    from sisr_tpu.ops.metrics import Metrics
    from sisr_tpu.evaluation.standard_eval import EvalHub
    from sisr_tpu.tools.e2e_bench import build_torch_edsr
    torch.set_num_threads(os.cpu_count())
    model = build_torch_edsr().eval()
    hub = Metrics(['PSNR', 'SSIM'], delimeter='>')  # host metrics (reference path)
    fake = type('H', (), {'scale': 4})()
    names = sorted(os.listdir(lr_dir))

    def run_once(names):
        for name in names:
            lr = np.asarray(Image.open(os.path.join(lr_dir, name)).convert('RGB'),
                            np.float32)[None] / 255.0
            hr = np.asarray(Image.open(os.path.join(hr_dir, name)).convert('RGB'),
                            np.float32)[None] / 255.0
            interp, _ = EvalHub._low_res_prep(fake, lr, timing=False)
            with torch.no_grad():
                out = model(torch.from_numpy(
                    lr.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
            out_y = EvalHub._high_res_prep(fake, np.clip(out, 0, 1))
            hr_y = EvalHub._high_res_prep(fake, hr)
            lr_y = EvalHub._high_res_prep(fake, interp)
            hub.run_metrics(lr_y, references=hr_y, key='LR')
            hub.run_metrics(out_y, references=hr_y, key='model')

    run_once(names[:2])  # warmup
    t0 = time.perf_counter()
    run_once(names)
    dt = time.perf_counter() - t0
    return len(names) / dt


def get_baseline():
    cache = {}
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if os.environ.get('BENCH_MEASURE_BASELINE') == '1' \
            or 'torch_cpu_e2e_img_per_sec' not in cache:
        with tempfile.TemporaryDirectory() as tmp:
            lr_dir, hr_dir = build_workload(tmp, N_IMAGES)
            log('measuring torch-CPU eval-protocol baseline (one-time, cached)...')
            cache['torch_cpu_e2e_img_per_sec'] = measure_e2e_torch(lr_dir, hr_dir)
            cache['e2e_workload'] = ('EDSR 64f/16b 4x 128->512 eval protocol '
                                     '(decode+prep+forward+metrics), torch CPU')
        with open(BASELINE_CACHE, 'w') as f:
            json.dump(cache, f)
    return cache['torch_cpu_e2e_img_per_sec']


def measure_forward_only():
    """Steady-state device-side forward throughput (round-1 headline, for the record).

    The timed loop runs INSIDE one jitted program (data-dependent fori_loop) and
    synchronizes via a host transfer: on the remote-execution tunnel,
    block_until_ready on dispatched calls can return before execution completes."""
    import jax
    import jax.numpy as jnp
    from sisr_tpu.models.advanced import EDSR

    model = EDSR(net_features=64, num_blocks=16, scale=4, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.rand(16, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            y = model.apply({'params': params}, carry)
            return (y[:, ::4, ::4, :] * 0.999).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))

    float(np.asarray(loop(variables['params'], x)))
    t0 = time.perf_counter()
    float(np.asarray(loop(variables['params'], x)))
    dt = (time.perf_counter() - t0) / ITERS
    return 16 / dt


def main():
    baseline = get_baseline()
    tmp = tempfile.mkdtemp(prefix='sisr_bench_')
    try:
        log('building workload...')
        lr_dir, hr_dir = build_workload(tmp, N_IMAGES)
        log('building experiment (device init)...')
        cfg = E2E_CONFIGS['edsr']
        model_loc = build_experiment(tmp, 'bench_edsr', cfg['model'],
                                     cfg['internal'], cfg['spatial'])
        log('running eval protocol...')
        e2e = measure_e2e(lr_dir, hr_dir, model_loc, os.path.join(tmp, 'out'),
                          'bench_edsr', BATCH, N_IMAGES, fused=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    try:
        fwd = measure_forward_only()
        log('forward-only device throughput: %.1f img/s/chip' % fwd)
    except Exception as exc:  # forward-only is informational; never fail the bench
        log('forward-only measurement failed: %s' % exc)
    log('e2e eval protocol: %.2f img/s/chip | torch-CPU e2e baseline: %.2f img/s'
        % (e2e, baseline))
    print(json.dumps({
        'metric': 'images_per_sec_per_chip_edsr_4x_eval_protocol_128to512',
        'value': round(e2e, 3),
        'unit': 'img/s/chip',
        'vs_baseline': round(e2e / baseline, 2),
    }))


if __name__ == '__main__':
    main()
