"""End-to-end eval-protocol benchmark machinery for the BASELINE configs.

BASELINE.md lists five benchmark configs to stand up; each is measured through the
REAL product eval path (`EvalHub.full_image_protocol`: PNG decode -> LR prep ->
jitted forward -> YCbCr -> PSNR/SSIM -> CSV), not a synthetic forward loop:

1. srcnn   — pre-upscaled (interp) y-channel input, host-PIL upscale in the loop
2. edsr    — 4x 128->512, fused device eval (the bench.py headline); also measured
             with the int8 serving fast path composed in ('edsr_int8' — NB: the e2e
             protocol at batch 8 is decode/transfer-bound, so int8's 1.16-1.25x
             forward-path win does not surface here; measured 30.0 vs 35.5 img/s)
3. qrcan   — meta-attention with 10-d blur-kernel metadata through the QModel path
4. san     — second-order attention with the static tile-grid eval engaged
5. sparnet — face SR 128->512 on the pre-upscaled pipeline

Shared by ``bench.py`` (driver contract, config #2) and
``python -m sisr_tpu.tools.bench_models --e2e`` (the full table).
"""
import json
import os
import sys
import time

import numpy as np

SET5_HR = '/root/reference/Data/example_data/Set5/hr'

# BASELINE benchmark configs #1-#5 (BASELINE.md "Benchmark configs to stand up")
E2E_CONFIGS = {
    'srcnn': dict(
        model='srcnn',
        internal={'scale': 4, 'kernel_pattern': [9, 1, 5],
                  'channel_pattern': [1, 64, 32, 1]},
        spatial=(512, 512), fused=True, metadata_cols=0),
    'edsr': dict(
        model='edsr',
        internal={'scale': 4, 'num_features': 64, 'num_blocks': 16, 'dtype': 'bf16'},
        spatial=(128, 128), fused=True, metadata_cols=0),
    'edsr_int8': dict(
        model='edsr',
        internal={'scale': 4, 'num_features': 64, 'num_blocks': 16, 'dtype': 'bf16'},
        spatial=(128, 128), fused=True, metadata_cols=0, int8=True),
    'qrcan': dict(
        model='qrcan',
        internal={'scale': 4, 'style': 'max_concat', 'include_q_layer': True,
                  'metadata': ['blur_kernel'], 'dtype': 'bf16'},
        spatial=(128, 128), fused=True, metadata_cols=10),
    'san': dict(
        model='san',
        # max_combined_im_size < 128^2 forces the static tile-grid eval (config #4
        # calls for the tiled path — the framework's forward_chop replacement)
        internal={'scale': 4, 'dtype': 'bf16', 'max_combined_im_size': 8192},
        spatial=(128, 128), fused=True, metadata_cols=0),
    'sparnet': dict(
        model='sparnet',
        internal={'scale': 4, 'dtype': 'bf16'},
        spatial=(512, 512), fused=True, metadata_cols=0),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_workload(root, n_images, lr_size=128, scale=4, metadata_cols=0):
    """N LR/HR PNG pairs shaped like the DIV2K 4x eval workload (lr_size^2 ->
    (lr_size*scale)^2).  Sourced from Set5 crops when available (realistic PNG
    entropy), else noise.  With ``metadata_cols``, writes the reference's
    degradation_metadata.csv contract (JSON blur-kernel lists) alongside the LR set."""
    from PIL import Image
    hr_size = lr_size * scale
    lr_dir = os.path.join(root, 'lr')
    hr_dir = os.path.join(root, 'hr')
    os.makedirs(lr_dir)
    os.makedirs(hr_dir)
    sources = []
    if os.path.isdir(SET5_HR):
        for f in sorted(os.listdir(SET5_HR)):
            im = Image.open(os.path.join(SET5_HR, f)).convert('RGB')
            if im.width >= 256 and im.height >= 256:
                sources.append(np.asarray(im.resize((hr_size, hr_size),
                                                    Image.BICUBIC)))
    rng = np.random.RandomState(0)
    names = []
    for i in range(n_images):
        if sources:
            hr = sources[i % len(sources)].copy()
            hr[:8, :8] = rng.randint(0, 255, (8, 8, 3))  # decorrelate duplicates
        else:
            hr = rng.randint(0, 255, (hr_size, hr_size, 3)).astype(np.uint8)
        name = 'im_%03d.png' % i
        names.append(name)
        hr_im = Image.fromarray(hr.astype(np.uint8))
        hr_im.save(os.path.join(hr_dir, name))
        hr_im.resize((lr_size, lr_size), Image.BICUBIC).save(
            os.path.join(lr_dir, name))
    if metadata_cols:
        with open(os.path.join(lr_dir, 'degradation_metadata.csv'), 'w') as f:
            f.write('image,blur_kernel\n')
            for name in names:
                kern = rng.dirichlet(np.ones(metadata_cols) * 5)
                f.write('%s,"%s"\n' % (name, json.dumps(kern.tolist())))
    return lr_dir, hr_dir


def build_experiment(root, name, model, internal, spatial, metadata_cols=0):
    """A ready-to-evaluate experiment dir (random init, epoch 0) for `name`."""
    from ..models.handlers import define_model
    from ..utils import toml_io
    base = os.path.join(root, 'Results', name)
    saved = os.path.join(base, 'saved_models')
    os.makedirs(saved)
    with open(os.path.join(base, 'config.toml'), 'w') as f:
        toml_io.dump({'model': {'name': model, 'internal_params': internal}}, f)
    h = define_model(model, eval_mode=False, **internal)
    if h.uses_metadata:
        h.set_metadata_keys(['blur_kernel'] * metadata_cols)
    h.init_state(spatial=spatial)
    h.save_model('train_model', 0, saved)
    h.wait_pending_checkpoints()  # epoch resolution below lists the dir on disk
    return os.path.join(root, 'Results')


def measure_e2e(lr_dir, hr_dir, model_loc, out_root, experiment, batch_size,
                n_images, fused=True, scale=4, int8=False, cache_decoded=True,
                cache_device=None):
    """Wall-clock the full product eval protocol; second pass (compiles amortized).

    ``cache_decoded=False`` disables BOTH the decoded-image cache and the fused
    protocol's device-batch reuse, so every timed pass performs the full protocol
    (decode -> prep -> upload -> forward -> metrics) — the number comparable to a
    baseline that also decodes every image.  ``cache_device=False`` keeps the
    decoded-image cache but re-uploads every pass: the wire-bound regime."""
    from ..evaluation.standard_eval import EvalHub
    hub = EvalHub(
        hr_dir=hr_dir, lr_dir=lr_dir, model_and_epoch=[(experiment, '0')],
        results_name='bench_eval', gpu=True, metrics=['PSNR', 'SSIM'],
        data_split='all', save_im=False, batch_size=batch_size, full_directory=True,
        lr_dir_interp=None, model_only=False, scale=scale, model_loc=model_loc,
        out_loc=out_root, use_test_group=False, no_image_comparison=True,
        num_image_save=0, qpi_selection=(None, None), data_attributes=None,
        dataset_name=None, image_shortlist=None, metadata_file=None, sp_gpu=0,
        time_models=False, recursive=False, device_metrics=True, fused_eval=fused,
        int8=int8, cache_decoded=cache_decoded, cache_device=cache_device)
    log('warmup protocol run (compiles)...')
    hub.full_image_protocol()
    # median-of-K with spread: the remote device tunnel's throughput varies run to
    # run, and one tunnel-lucky pass must not become the headline (VERDICT r2
    # item 4) — the median is the deliverable; min/max are logged for the record
    rates = []
    for i in range(int(os.environ.get('BENCH_PASSES', '5'))):
        log('timed protocol run %d...' % i)
        t0 = time.perf_counter()
        hub.full_image_protocol()
        rates.append(n_images / (time.perf_counter() - t0))
    rates.sort()
    log('protocol passes (img/s): median %.2f | min %.2f | max %.2f | n=%d'
        % (rates[len(rates) // 2], rates[0], rates[-1], len(rates)))
    return rates[len(rates) // 2]


def run_config(key, n_images=32, batch_size=8):
    """Build workload + experiment for BASELINE config `key`, return e2e img/s."""
    import shutil
    import tempfile
    cfg = E2E_CONFIGS[key]
    tmp = tempfile.mkdtemp(prefix='sisr_e2e_%s_' % key)
    try:
        lr_dir, hr_dir = build_workload(tmp, n_images,
                                        metadata_cols=cfg['metadata_cols'])
        model_loc = build_experiment(tmp, 'bench_%s' % key, cfg['model'],
                                     cfg['internal'], cfg['spatial'],
                                     metadata_cols=cfg['metadata_cols'])
        return measure_e2e(lr_dir, hr_dir, model_loc, os.path.join(tmp, 'out'),
                           'bench_%s' % key, batch_size, n_images,
                           fused=cfg['fused'], int8=cfg.get('int8', False))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_train_bench(n_images=128, batch_size=8, crop=32, steps_per_dispatch=1,
                    cache_decoded=False):
    """END-TO-END training-epoch throughput (BASELINE config #2's train side):
    the real product loop — threaded decode, random crops/augments, device
    prefetch, jitted train step (fwd+bwd+adam+schedule in one XLA program),
    optional K-step fused dispatch — for EDSR 64f/16b at LR crop `crop`.

    Returns images/sec over the best of 3 epochs (first epoch compiles)."""
    import shutil
    import tempfile
    from ..training.handler import TrainingHandler
    from ..utils.toml_io import convert_default_none_dict
    tmp = tempfile.mkdtemp(prefix='sisr_trainbench_')
    try:
        lr_dir, hr_dir = build_workload(tmp, n_images)
        data_params = convert_default_none_dict({
            'training_sets': {'data_1': {'lr': lr_dir, 'hr': hr_dir, 'crop': crop,
                                         'random_augment': True,
                                         'cache_decoded': cache_decoded}},
            'eval_sets': {'data_1': {'lr': lr_dir, 'hr': hr_dir, 'cutoff': 2}},
            'batch_size': batch_size, 'dataloader_threads': 8})
        handler = TrainingHandler(
            experiment_name='bench_train', save_loc=os.path.join(tmp, 'Results'),
            model_params={'name': 'edsr',
                          'internal_params': {'scale': 4, 'num_features': 64,
                                              'num_blocks': 16, 'dtype': 'bf16'}},
            data_params=data_params, num_epochs=1, metrics=[], seed=8,
            logging=None, save_samples=False,
            steps_per_dispatch=steps_per_dispatch)
        log('warmup training epoch (compiles)...')
        handler.train()
        best = 0.0
        for i in range(3):
            log('timed training epoch %d...' % i)
            t0 = time.perf_counter()
            handler.train()
            best = max(best, n_images / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_val_bench(n_images=64, eval_batch_size=4):
    """Training-time VALIDATION epoch throughput, standard host path vs fused_val
    (forward + YCbCr + PSNR/SSIM + loss in one device program per batch, async
    dispatch, one epoch-end transfer).  EDSR 64f/16b on the 128->512 workload.

    Returns (standard_img_s, fused_img_s) over the best of 3 epochs each."""
    import shutil
    import tempfile
    from ..training.handler import TrainingHandler
    from ..utils.toml_io import convert_default_none_dict
    tmp = tempfile.mkdtemp(prefix='sisr_valbench_')
    try:
        lr_dir, hr_dir = build_workload(tmp, n_images)
        data_params = convert_default_none_dict({
            'training_sets': {'data_1': {'lr': lr_dir, 'hr': hr_dir, 'crop': 32}},
            'eval_sets': {'data_1': {'lr': lr_dir, 'hr': hr_dir,
                                     'cutoff': n_images}},
            'batch_size': 8, 'eval_batch_size': eval_batch_size,
            'dataloader_threads': 8})
        handler = TrainingHandler(
            experiment_name='bench_val', save_loc=os.path.join(tmp, 'Results'),
            model_params={'name': 'edsr',
                          'internal_params': {'scale': 4, 'num_features': 64,
                                              'num_blocks': 16, 'dtype': 'bf16'}},
            data_params=data_params, num_epochs=1, metrics=['PSNR', 'SSIM'],
            seed=8, logging=None, save_samples=False)
        handler.model.model.init_state()
        results = {}
        for fused in (False, True):
            handler.fused_val = fused
            log('warmup val epoch (fused=%s, compiles)...' % fused)
            handler.eval(0)
            best = 0.0
            for i in range(3):
                t0 = time.perf_counter()
                handler.eval(0)
                best = max(best, n_images / (time.perf_counter() - t0))
            results[fused] = best
        return results[False], results[True]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def build_torch_edsr():
    """The reference-equivalent torch EDSR 64f/16b (public standard architecture),
    shared by the eval baseline (bench.py) and the train baseline below."""
    import torch
    import torch.nn as nn

    class ResBlock(nn.Module):
        def __init__(s, n):
            super().__init__()
            s.c1 = nn.Conv2d(n, n, 3, padding=1)
            s.c2 = nn.Conv2d(n, n, 3, padding=1)

        def forward(s, x):
            return x + 0.1 * s.c2(torch.relu(s.c1(x)))

    class EDSR(nn.Module):
        def __init__(s, n=64, blocks=16):
            super().__init__()
            s.head = nn.Conv2d(3, n, 3, padding=1)
            s.body = nn.Sequential(*[ResBlock(n) for _ in range(blocks)])
            s.bt = nn.Conv2d(n, n, 3, padding=1)
            ups = []
            for _ in range(2):
                ups += [nn.Conv2d(n, 4 * n, 3, padding=1), nn.PixelShuffle(2)]
            s.up = nn.Sequential(*ups)
            s.tail = nn.Conv2d(n, 3, 3, padding=1)

        def forward(s, x):
            x = s.head(x)
            r = s.bt(s.body(x)) + x
            return s.tail(s.up(r))

    return EDSR()


def measure_train_torch(n_steps=6, batch_size=8, crop=32):
    """torch-CPU train-step baseline: the same EDSR 64f/16b forward+backward+Adam
    at the same crop/batch (model definition shared with bench.py's baseline)."""
    import torch
    import torch.nn as nn
    torch.set_num_threads(os.cpu_count())
    model = build_torch_edsr().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = nn.L1Loss()
    x = torch.rand(batch_size, 3, crop, crop)
    y = torch.rand(batch_size, 3, crop * 4, crop * 4)
    for _ in range(2):  # warmup
        opt.zero_grad(); crit(model(x), y).backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        opt.zero_grad(); crit(model(x), y).backward(); opt.step()
    return n_steps * batch_size / (time.perf_counter() - t0)
