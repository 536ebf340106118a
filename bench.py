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
METRIC = 'images_per_sec_per_chip_edsr_4x_eval_protocol_128to512'
# bf16 peak of the target part (v5e); override for other chips
PEAK_TFLOPS = float(os.environ.get('BENCH_PEAK_TFLOPS', '197'))


def probe_backend(budget=None, retries=None):
    """Initialize the accelerator backend in a SUBPROCESS with a wall-clock budget,
    retrying with backoff.  The remote-attached TPU service (axon tunnel) can be
    transiently unreachable, and an in-process ``jax.devices()`` then blocks forever
    in a backend-init retry loop — which round 3 turned into an unparseable rc=1/
    rc=124 driver artifact.  Returns the platform name, or None if the backend never
    came up (callers must then emit a structured error line, not a traceback)."""
    import subprocess
    if budget is None:
        budget = float(os.environ.get('BENCH_PROBE_BUDGET', '75'))
    if retries is None:
        retries = int(os.environ.get('BENCH_PROBE_RETRIES', '3'))
    # honor JAX_PLATFORMS through jax.config too: the axon sitecustomize imports
    # jax before user code, after which the env var alone no longer selects the
    # platform (same workaround as tests/conftest.py and dryrun_multichip)
    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p and ',' not in p:\n"
            "    jax.config.update('jax_platforms', p)\n"
            "d = jax.devices()\n"
            "print('PROBE_OK', d[0].platform, len(d))")
    for attempt in range(1, retries + 1):
        t0 = time.perf_counter()
        try:
            res = subprocess.run([sys.executable, '-c', code],
                                 capture_output=True, text=True, timeout=budget)
        except Exception as exc:  # TimeoutExpired and anything else
            log('backend probe %d/%d: %s after %.0fs'
                % (attempt, retries, type(exc).__name__, time.perf_counter() - t0))
        else:
            for line in res.stdout.splitlines():
                if line.startswith('PROBE_OK'):
                    _, platform, n = line.split()
                    log('backend probe %d/%d: %s x%s up in %.1fs'
                        % (attempt, retries, platform, n,
                           time.perf_counter() - t0))
                    return platform
            log('backend probe %d/%d: rc=%d %s'
                % (attempt, retries, res.returncode,
                   (res.stderr or '').strip().splitlines()[-1:]))
        if attempt < retries:
            time.sleep(10.0 * attempt)
    return None


from sisr_tpu.tools.flops import edsr_flops_per_image


def emit(value, vs_baseline, extra=None):
    out = {'metric': METRIC,
           'value': None if value is None else round(value, 3),
           'unit': 'img/s/chip',
           'vs_baseline': None if vs_baseline is None else round(vs_baseline, 2)}
    out.update(extra or {})
    print(json.dumps(out))


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


def measure_forward_only(feats=64, blocks=16, batch=16, iters=None):
    """Steady-state device-side forward throughput (round-1 headline, for the record).

    The timed loop runs INSIDE one jitted program (data-dependent fori_loop) and
    synchronizes via a host transfer: on the remote-execution tunnel,
    block_until_ready on dispatched calls can return before execution completes."""
    import jax
    import jax.numpy as jnp
    from sisr_tpu.models.advanced import EDSR

    iters = ITERS if iters is None else iters
    model = EDSR(net_features=feats, num_blocks=blocks, scale=4, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.rand(batch, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            y = model.apply({'params': params}, carry)
            return (y[:, ::4, ::4, :] * 0.999).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))

    float(np.asarray(loop(variables['params'], x)))
    t0 = time.perf_counter()
    float(np.asarray(loop(variables['params'], x)))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def _apply_platform_env():
    """Make JAX_PLATFORMS effective in THIS process despite the axon sitecustomize
    having imported jax already (env-var platform selection is latched at import)."""
    p = os.environ.get('JAX_PLATFORMS')
    if p and ',' not in p:
        try:
            import jax
            jax.config.update('jax_platforms', p)
        except Exception:
            pass


def run_measurements():
    """The measured body (runs in the watchdogged child): uncached protocol
    (every timed pass does decode -> prep -> upload -> forward -> metrics; the
    number comparable to the torch baseline and to BENCH_r02/r03) plus the
    cached fast path (decoded-image + device-batch reuse across passes) and the
    forward-only/MFU record."""
    _apply_platform_env()
    baseline = get_baseline()
    tmp = tempfile.mkdtemp(prefix='sisr_bench_')
    try:
        log('building workload...')
        lr_dir, hr_dir = build_workload(tmp, N_IMAGES)
        log('building experiment (device init)...')
        cfg = E2E_CONFIGS['edsr']
        model_loc = build_experiment(tmp, 'bench_edsr', cfg['model'],
                                     cfg['internal'], cfg['spatial'])
        log('running eval protocol (caches off — the apples-to-apples number)...')
        e2e = measure_e2e(lr_dir, hr_dir, model_loc, os.path.join(tmp, 'out'),
                          'bench_edsr', BATCH, N_IMAGES, fused=True,
                          cache_decoded=False)
        log('running eval protocol (decode cache only — the wire-bound regime)...')
        e2e_wire = measure_e2e(lr_dir, hr_dir, model_loc,
                               os.path.join(tmp, 'out3'), 'bench_edsr',
                               BATCH, N_IMAGES, fused=True, cache_decoded=True,
                               cache_device=False)
        log('running eval protocol (caches on — the product fast path)...')
        e2e_cached = measure_e2e(lr_dir, hr_dir, model_loc,
                                 os.path.join(tmp, 'out2'), 'bench_edsr',
                                 BATCH, N_IMAGES, fused=True, cache_decoded=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    extra = {'decode_cached_img_per_sec': round(e2e_wire, 3),
             'cached_img_per_sec': round(e2e_cached, 3),
             'cached_vs_baseline': round(e2e_cached / baseline, 2)}
    try:
        fwd = measure_forward_only()
        mfu = fwd * edsr_flops_per_image() / (PEAK_TFLOPS * 1e12)
        log('forward-only device throughput: %.1f img/s/chip '
            '(%.1f%% MFU at %.0f bf16 peak TFLOP/s)'
            % (fwd, 100 * mfu, PEAK_TFLOPS))
        extra['forward_only_img_per_sec'] = round(fwd, 1)
        extra['mfu'] = round(mfu, 4)
    except Exception as exc:  # forward-only is informational; never fail
        log('forward-only measurement failed: %s' % exc)
    if os.environ.get('BENCH_SKIP_PAPER') != '1':
        try:
            # PAPER-scale flagship (the SPL recipe: EDSR 256 feats / 32 blocks, ref
            # Documentation/sample_config_files/div2k/edsr.toml:43-57).  The dev-size
            # MFU above is lane-limited at C=64; this is the flagship-size figure.
            # Compile dominates (~4 min over the tunnel); the timed loop is short.
            # batch 16 measured ~7%% better MXU utilization than 8 (92.5 vs 86.6
            # img/s; batch 12 tiles poorly at 58.7%%) and fits comfortably: the
            # 1024-ch upsampler maps at 256^2 are ~2.1 GB bf16 at batch 16
            fwd_p = measure_forward_only(feats=256, blocks=32, batch=16, iters=6)
            mfu_p = fwd_p * edsr_flops_per_image(feats=256, blocks=32) \
                / (PEAK_TFLOPS * 1e12)
            log('PAPER-scale forward (EDSR 256f/32b, batch 16): %.1f img/s/chip '
                '(%.1f%% MFU)' % (fwd_p, 100 * mfu_p))
            extra['forward_only_paper_img_per_sec'] = round(fwd_p, 1)
            extra['mfu_paper_scale'] = round(mfu_p, 4)
        except Exception as exc:
            log('paper-scale forward measurement failed: %s' % exc)
    log('e2e eval protocol: %.2f img/s/chip uncached, %.2f decode-cached '
        '(wire-bound), %.2f fully cached | torch-CPU e2e baseline: %.2f img/s'
        % (e2e, e2e_wire, e2e_cached, baseline))
    emit(e2e, e2e / baseline, extra)


def main():
    # the ONE JSON line is the driver contract: whatever happens below, a
    # structured line is printed (never a bare traceback with no JSON — round 3's
    # rc=1 artifact recorded nothing and the round scored zero on perf)
    if os.environ.get('_SISR_BENCH_CHILD') == '1':
        try:
            run_measurements()
        except Exception as exc:
            import traceback
            traceback.print_exc()
            emit(None, None, {'error': '%s: %s' % (type(exc).__name__, exc)})
        return
    platform = probe_backend()
    if platform is None:
        emit(None, None, {'error': 'tpu-unavailable: backend init failed or '
                                   'timed out in a subprocess after 3 attempts'})
        return
    # the measurement itself also runs under a wall-clock bound in a child
    # process: if the tunnel drops BETWEEN the probe and the run, in-process
    # backend init would hang forever (a hang, not an exception — no try/except
    # can turn it into a JSON line)
    import subprocess
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, '_SISR_BENCH_CHILD': '1'},
            capture_output=True, text=True,
            timeout=float(os.environ.get('SISR_BENCH_TIMEOUT', '2700')))
    except subprocess.TimeoutExpired as exc:
        sys.stderr.write((exc.stderr or b'').decode(errors='replace')
                         if isinstance(exc.stderr, bytes) else (exc.stderr or ''))
        emit(None, None, {'error': 'measurement timed out after %ss '
                                   '(backend hang mid-run?)' % exc.timeout,
                          'platform': platform})
        return
    sys.stderr.write(res.stderr or '')
    json_lines = [l for l in (res.stdout or '').splitlines()
                  if l.startswith('{')]
    if json_lines:
        rec = json.loads(json_lines[-1])
        rec.setdefault('platform', platform)
        print(json.dumps(rec))
    else:
        emit(None, None, {'error': 'measurement child exited rc=%d with no '
                                   'JSON line' % res.returncode,
                          'platform': platform})


if __name__ == '__main__':
    main()
