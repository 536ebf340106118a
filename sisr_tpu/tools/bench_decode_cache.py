"""Measure the persisted decoded-uint8 disk cache (`.npy` sidecars) end-to-end.

VERDICT r4 item 8: the uncached eval protocol sits under the ~47 img/s host PNG
decode ceiling; a persisted decode cache lets COLD runs (fresh processes) skip
PNG entirely.  Decision rule, same as the Pallas-epilogue playbook: make the
sidecar path a *recommended default* only if it improves the e2e protocol by
>= +15%; otherwise keep it opt-in (``--decoded_cache_dir``) and archive the
measurement here.

Method — both arms run the REAL product path (`EvalHub.full_image_protocol`,
EDSR 4x 128->512 fused, the bench.py headline config) with the in-memory cache
defeated so every timed pass pays the image-ingest cost:

* arm "png":     ``cache_decoded=False`` — every pass decodes every PNG.
* arm "sidecar": ``cache_decoded='sidecar'`` with the in-memory budget zeroed
                 after warmup — every pass np.load()s the pre-populated
                 sidecars instead of decoding.

Run: ``python -m sisr_tpu.tools.bench_decode_cache [--images 32] [--batch 8]``
Prints one JSON line with both medians and the ratio.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def _timed_passes(hub, n_images, passes, defeat_mem_cache):
    """Warmup (compiles + populates caches), then `passes` timed protocol runs.
    With ``defeat_mem_cache``, the decoded-uint8 RAM cache is emptied and its
    budget zeroed after warmup so every timed pass re-reads from disk."""
    hub.full_image_protocol()
    if defeat_mem_cache:
        for loader in (hub.rgb_data, hub.interp_loader):
            if loader is None:
                continue
            ds = loader.dataset
            with ds._decode_cache_lock:
                ds._decode_cache.clear()
                ds._decode_cache_bytes = 0
                ds._decode_cache_cap = 0
    rates = []
    for i in range(passes):
        t0 = time.perf_counter()
        hub.full_image_protocol()
        rates.append(n_images / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], rates


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=32)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--passes', type=int, default=5)
    args = ap.parse_args(argv)

    from .e2e_bench import E2E_CONFIGS, build_experiment, build_workload, log
    from ..evaluation.standard_eval import EvalHub

    cfg = E2E_CONFIGS['edsr']
    tmp = tempfile.mkdtemp(prefix='sisr_decodecache_')
    try:
        lr_dir, hr_dir = build_workload(tmp, args.images)
        model_loc = build_experiment(tmp, 'bench_edsr', cfg['model'],
                                     cfg['internal'], cfg['spatial'])

        def make_hub(tag, cache_decoded):
            return EvalHub(
                hr_dir=hr_dir, lr_dir=lr_dir, model_and_epoch=[('bench_edsr', '0')],
                results_name='bench_%s' % tag, gpu=True, metrics=['PSNR', 'SSIM'],
                data_split='all', save_im=False, batch_size=args.batch,
                full_directory=True, lr_dir_interp=None, model_only=False,
                scale=4, model_loc=model_loc, out_loc=os.path.join(tmp, 'out'),
                use_test_group=False, no_image_comparison=True, num_image_save=0,
                qpi_selection=(None, None), data_attributes=None,
                dataset_name=None, image_shortlist=None, metadata_file=None,
                sp_gpu=0, time_models=False, recursive=False,
                device_metrics=True, fused_eval=True,
                cache_decoded=cache_decoded)

        log('arm png: every pass decodes every PNG...')
        png_med, png_rates = _timed_passes(
            make_hub('png', False), args.images, args.passes,
            defeat_mem_cache=False)  # cache_decoded=False already re-decodes
        log('png passes (img/s): %s' % ['%.2f' % r for r in png_rates])

        log('arm sidecar: every pass np.loads pre-populated sidecars...')
        side_med, side_rates = _timed_passes(
            make_hub('sidecar', 'sidecar'), args.images, args.passes,
            defeat_mem_cache=True)
        log('sidecar passes (img/s): %s' % ['%.2f' % r for r in side_rates])

        result = {
            'metric': 'decode_cache_e2e_edsr_4x_128to512',
            'png_img_per_sec': round(png_med, 3),
            'sidecar_img_per_sec': round(side_med, 3),
            'sidecar_speedup': round(side_med / png_med, 4),
            'unit': 'img/s/chip',
            'recommend_default': side_med / png_med >= 1.15,
        }
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    sys.exit(main())
