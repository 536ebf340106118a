"""EvalHub: model evaluation/benchmark protocols
(ref: Code/SISR/evaluation/standard_eval.py:23-326).

Image tensors are N,H,W,C float32 in [0,1].  LR bicubic prep uses the bit-exact PIL
fixed-point path by default (host), so LR baseline metrics match the reference exactly.
"""
from collections import defaultdict, OrderedDict
import itertools
import os
import time

import numpy as np
import pandas as pd
from tqdm import tqdm

from ..data.datasets import SuperResImages
from ..data.loader import DataLoader
from ..models.interface import ModelInterface
from ..ops.colorspace import ycbcr_convert
from ..ops.metrics import Metrics
from ..ops.resize import resize_uint8
from ..tools.visualization import interpret_sisr_images, safe_image_save
from ..utils import toml_io
from ..utils.helpers import create_dir_if_empty


class EvalHub:
    def __init__(self, hr_dir, lr_dir, model_and_epoch, results_name, gpu, metrics,
                 data_split, save_im, batch_size, full_directory, lr_dir_interp,
                 model_only, scale, model_loc, out_loc, use_test_group,
                 no_image_comparison, num_image_save, qpi_selection, data_attributes,
                 dataset_name, image_shortlist, metadata_file, sp_gpu, time_models,
                 recursive, mesh=False, eval_buckets=None, int8=False,
                 device_metrics=False, fused_eval=False, face_model='lightcnn',
                 face_weights=None, cache_decoded=True, cache_device=None,
                 decoded_cache_dir=None):
        """Main eval class; param info in net_eval.py (mirrors the reference CLI)."""
        if decoded_cache_dir:
            # persisted decoded-uint8 sidecars: cold runs skip PNG decode (the
            # ~47 img/s host ceiling); the value is a dir or 'sidecar'
            cache_decoded = decoded_cache_dir
        self.out_dir = os.path.join(out_loc, results_name)
        self.eval_name = results_name
        create_dir_if_empty(self.out_dir)
        input_params = {k: v for k, v in locals().items()
                        if k not in ('self',) and not k.startswith('_')}
        with open(os.path.join(self.out_dir, 'config.toml'), 'w') as f:
            toml_io.dump({k: list(v) if isinstance(v, tuple) else v
                          for k, v in input_params.items() if v is not None}, f)

        if not model_and_epoch:
            raise ValueError('No models specified: pass at least one '
                             '-me/--model_and_epoch EXPERIMENT EPOCH pair.')
        experiment_names, eval_epochs = zip(*model_and_epoch)

        self.metrics = metrics
        self.scale = scale
        self.full_directory = full_directory
        self.no_image_comparison = no_image_comparison
        self.model_only = model_only
        self.num_image_save = num_image_save
        self.time_models = time_models
        self.images_processed = 0
        self.save_im = save_im

        self.model_bundles = self._prep_models(model_loc, experiment_names, eval_epochs,
                                               gpu, scale=scale, sp_gpu=sp_gpu,
                                               mesh=mesh)
        if eval_buckets:
            for model in self.model_bundles:
                model.model.set_eval_buckets(eval_buckets)
        if int8:
            for model in self.model_bundles:
                model.model.set_int8(True)

        if full_directory:
            split, dataset, custom_split, blacklist = 'all', None, None, None
        else:
            split = data_split if data_split is not None else 'eval'
            dataset = dataset_name
            custom_split = (162899, 163000) if use_test_group else None
            blacklist = None

        if metadata_file is not None and not os.path.isfile(metadata_file):
            # an explicitly requested file must exist — silently falling back to the
            # lr_dir defaults would run with different metadata than asked for
            raise FileNotFoundError('metadata_file not found: %s' % metadata_file)
        if metadata_file is None:
            metadata_file = os.path.join(lr_dir, 'degradation_metadata.csv')
        if not os.path.isfile(metadata_file):
            metadata_file = os.path.join(lr_dir, 'qpi_slices.csv')
            if not os.path.isfile(metadata_file):
                print('No metadata file found.')
                metadata_file = None
                requested_metadata = None
            else:
                requested_metadata = 'all'
        else:
            requested_metadata = 'all'

        # decoded-uint8 cache (capped, see SuperResImages): eval protocols
        # re-iterate the same images — across warmup+timed passes, multi-model
        # comparisons and repeated hub calls — and on a weak host PNG decode is
        # the throughput ceiling (~47 img/s at 512^2 on one vCPU), dwarfing the
        # device forward.  First pass decodes, later passes read memory.
        rgb_handler = SuperResImages(
            lr_dir, hr_dir, y_only=False, split=split, input='unmodified',
            dataset=dataset, colorspace='rgb', conv_type='jpg', scale=scale,
            custom_split=custom_split, blacklist=blacklist, qpi_selection=qpi_selection,
            degradation_metadata_file=metadata_file, metadata=requested_metadata,
            data_attributes=data_attributes, image_shortlist=image_shortlist,
            recursive_search=recursive, cache_decoded=cache_decoded)
        self.rgb_data = DataLoader(dataset=rgb_handler, batch_size=batch_size)
        for model in self.model_bundles:
            model.set_metadata_keys(rgb_handler.metadata_keys)

        if lr_dir_interp:
            interp_handler = SuperResImages(
                lr_dir_interp, hr_dir, y_only=False, split=split, input='interp',
                dataset=dataset, blacklist=blacklist,
                degradation_metadata_file=metadata_file, colorspace='rgb',
                conv_type='jpg', scale=scale, custom_split=custom_split,
                qpi_selection=qpi_selection, image_shortlist=image_shortlist,
                recursive_search=recursive, cache_decoded=cache_decoded)
            # kept as a LOADER (not a single iterator like ref standard_eval.py:106):
            # each protocol invocation re-iterates, so warmup+timed double runs and
            # repeated calls on one hub work
            self.interp_loader = DataLoader(dataset=interp_handler,
                                            batch_size=batch_size)
        else:
            self.interp_loader = None
        self.interp_data = None  # per-run iterator, set at protocol start

        self.comparisons_dir = os.path.join(self.out_dir, 'model_comparisons')
        if not no_image_comparison:
            create_dir_if_empty(self.comparisons_dir)

        self.save_folders = {}
        if save_im or model_only:
            for exp in experiment_names:
                save_folder = os.path.join(self.out_dir, exp)
                self.save_folders[exp] = save_folder
                create_dir_if_empty(save_folder)

        # FACE_SIM (face-embedding cosine similarity, the reference's half-wired
        # face-recognition eval completed) runs on the RGB images, not the Y-channel
        # preps, so it is split out of the standard metric loop
        self.face_metric = metrics is not None and 'FACE_SIM' in metrics \
            and not model_only  # model_only never computes metrics: skip the weights
        if self.face_metric:
            from ..models.feature_extractors import load_face_extractor
            face_extractor = load_face_extractor(face_model, face_weights)
        else:
            face_extractor = None
        if metrics is not None and 'FACE_SIM' in metrics:
            metrics = [m for m in metrics if m != 'FACE_SIM']
            self.metrics = metrics
        if metrics is not None:
            self.metric_hub = Metrics(metrics, delimeter='>', device=device_metrics,
                                      face_extractor=face_extractor)

        # fused device eval: metrics-only runs where forward + LR baseline + YCbCr +
        # PSNR/SSIM execute as one device program and only scalars reach the host.
        # lr_dir_interp supplies externally-interpolated LR images the fused path
        # cannot honor (it computes the device bicubic instead) — stay standard.
        self.fused_eval = bool(fused_eval) and bool(metrics) \
            and not model_only and not save_im and no_image_comparison \
            and not self.face_metric and not lr_dir_interp
        if fused_eval and not self.fused_eval:
            print('fused_eval needs metrics and no image outputs '
                  '(--no_image_comparison, no --save_im/--model_only, no '
                  '--lr_dir_interp) — disabled.')
        # with cache_decoded, repeated fused protocol runs also reuse the
        # DEVICE-resident batches from the first pass (the eval set's uint8
        # images are already in HBM — re-uploading identical bytes over the
        # device tunnel every pass is pure waste).  Capped; populated only on a
        # complete pass; bypassed entirely by the standard protocol.
        # cache_device=False keeps the decoded-image cache but re-uploads every
        # pass (benchmarks use it to isolate the wire-bound regime).
        self.cache_decoded = bool(cache_decoded)
        self.cache_device = self.cache_decoded if cache_device is None \
            else bool(cache_device)
        self._device_batch_cache = None
        self._device_batch_cache_cap = 1 << 30

    @staticmethod
    def _prep_models(model_loc, experiment_names, eval_epochs, gpu, scale=4, sp_gpu=0,
                     mesh=False):
        """(ref: standard_eval.py:127-144).  ``mesh=True`` puts every eval model on a
        data-parallel device mesh (batch + spatial-tile sharding) — the product path for
        multi-chip eval."""
        device_mode = 'multi' if mesh else ('single' if gpu else 'off')
        models = []
        for experiment, eval_epoch in zip(experiment_names, eval_epochs):
            models.append(ModelInterface(
                model_loc, experiment,
                load_epoch=eval_epoch if eval_epoch in ('best', 'last')
                else int(eval_epoch),
                gpu=device_mode, scale=scale, sp_gpu=sp_gpu))
        return models

    def _low_res_prep(self, lr_data, timing=True):
        """Bicubic x-scale upsample of the LR batch, PIL-bit-exact, timed
        (ref: standard_eval.py:146-158)."""
        lr_data = np.asarray(lr_data)
        n, h, w, c = lr_data.shape
        interp = np.empty((n, h * self.scale, w * self.scale, c), np.float32)
        times = [] if timing else None
        for i in range(n):
            u8 = (lr_data[i] * 255).astype(np.uint8)  # ToPILImage semantics (truncate)
            if timing:
                tic = time.perf_counter()
            resized = resize_uint8(u8, (w * self.scale, h * self.scale))
            if timing:
                times.append(time.perf_counter() - tic)
            interp[i] = resized.astype(np.float32) / 255.0
        return interp, times

    def _high_res_prep(self, hr_data):
        """RGB -> full 3-channel YCbCr ('jpg' matrices), with [0,1] clip
        (ref: standard_eval.py:160-164, ycbcr_convert(..., y_only=False)).

        Metrics consume only channel 0 (Y), and ycbcr models take channel 0 as
        input; channels 1-2 are the true Cb/Cr, which ycbcr models' outputs are
        recombined with when saving SR images (ModelInterface.net_run_and_process)
        — a Y-broadcast here would silently wreck those images' colors."""
        prep = ModelInterface._standard_image_formatting(np.asarray(hr_data))
        for i in range(prep.shape[0]):
            chw = prep[i].transpose(2, 0, 1)
            prep[i] = ycbcr_convert(chw, im_type='jpg', input='rgb',
                                    y_only=False).transpose(1, 2, 0)
        return prep

    def _generate_image_collage(self, interp_data, model_data, probe_names, metrics=None,
                                metric_slice=None, hr_rgb=None):
        metrics = metrics if metrics is not None else []
        metric_slice = metric_slice if metric_slice is not None else {}
        if hr_rgb is not None:
            output_package = OrderedDict([('HR', np.asarray(hr_rgb)),
                                          ('LR', np.asarray(interp_data))])
        else:
            output_package = OrderedDict([('LR', np.asarray(interp_data))])
        output_package.update(model_data)
        interpret_sisr_images(
            output_package, metric_slice, metrics, self.comparisons_dir,
            names=['image_comparison_%s.pdf' % p.replace(os.path.sep, '_')
                   for p in probe_names],
            direct_view=False, config='rgb',
            extra_info={model.experiment: [['epoch', model.model_epoch]]
                        for model in self.model_bundles})

    def direct_model_protocol(self):
        """SR-image-only run (ref: standard_eval.py:187-215)."""
        # undo fused-run transport if a previous protocol call on this hub
        # enabled it: this path expects float, host-stacked batches
        for ds in getattr(self.rgb_data.dataset, 'datasets', [self.rgb_data.dataset]):
            ds.keep_uint8 = False
        self.rgb_data.device_collate = False
        self.interp_data = iter(self.interp_loader) if self.interp_loader else None
        with tqdm(total=len(self.rgb_data)) as pbar:
            for index, batch in enumerate(self.rgb_data):
                lr_rgb, im_names = batch['lr'], batch['tag']
                self.images_processed += len(im_names)
                probe_names = [n.split('.')[0] for n in list(im_names)]
                if self.interp_data:
                    interp_data = next(self.interp_data)['lr']
                else:
                    interp_data, _ = self._low_res_prep(lr_rgb, timing=False)
                output_package = {}
                for model in self.model_bundles:
                    # 'rgb' IN colorspace, not ==: the reference's direct protocol
                    # (standard_eval.py:201) disagrees with its own full protocol
                    # (:255) here and feeds augmented_rgb metadata models YCbCr
                    # inputs — silently-wrong SR output, fixed rather than ported
                    if 'rgb' in model.configuration['colorspace']:
                        selected_im = lr_rgb if model.configuration['input'] == \
                            'unmodified' else interp_data
                    else:
                        selected_im = self._high_res_prep(interp_data)
                    rgb_im, ycbcr_im, _, _ = model.net_run_and_process(
                        **{**batch, **{'lr': selected_im}})
                    folder = self.save_folders[model.experiment]
                    for name in im_names:  # recursive datasets: subdirs must exist
                        if os.sep in name:
                            create_dir_if_empty(os.path.join(
                                folder, os.path.dirname(name)))
                    safe_image_save(rgb_im, folder, im_names, config='rgb')
                    output_package[model.experiment] = rgb_im
                if not self.no_image_comparison:
                    self._generate_image_collage(interp_data, output_package,
                                                 probe_names=probe_names)
                pbar.update(1)

    def _fused_image_protocol(self):
        """Metrics-only eval with the whole per-batch pipeline fused on device
        (see BaseHandler.run_eval_fused).  Output CSV contract is unchanged, except
        ``LR>runtime`` under --time_models: the LR prep is fused into the device
        program, so no separable host resize time exists — the column is emitted
        as NaN to keep the schema stable across fused/standard runs.

        The per-batch metric matrix stays as ONE unrealized (K, N) device array until
        the whole set is dispatched (jax async): host decode of batch i+1 overlaps
        device compute of batch i, per-batch dispatch latency hides behind the device
        queue, and each batch costs a single scalar-matrix download — the difference
        between ~10x and ~40x baseline on remote-attached chips.  The source dataset
        serves uint8 (keep_uint8) so no host float conversion ever happens."""
        for ds in getattr(self.rgb_data.dataset, 'datasets', [self.rgb_data.dataset]):
            ds.keep_uint8 = True
        # uniform u8 images skip the host-collate memcpy and stack in HBM instead
        # (single-device only: the mesh path shards a host-stacked batch)
        self.rgb_data.device_collate = \
            getattr(self.model_bundles[0].model, 'mesh_ctx', None) is None
        metric_package = defaultdict(list)
        pending = []  # (experiment, is_first_model, keys, (K,N) device vals, rt, n)
        # upload-ahead: on remote-attached chips the device_put RPC serializes the
        # batch bytes on the calling thread (HR uint8 dominates, ~6 MB per batch of
        # 8 at 512^2); staging the NEXT batch's transfer in a background thread
        # overlaps it with the current batch's dispatch/compute
        from concurrent.futures import ThreadPoolExecutor
        from ..data.loader import device_prefetch
        collect = None
        if self._device_batch_cache is not None:
            # later passes: the whole eval set is already on device — no decode,
            # no host collate, no tunnel upload
            batches = iter(self._device_batch_cache)
        else:
            batches = device_prefetch(iter(self.rgb_data), size=2)
            if self.cache_device:
                collect = []
                batches = self._collecting_iter(batches, collect)
        # results download on a BACKGROUND thread as soon as each batch dispatches:
        # the compute wait + the payload-independent ~31 ms download round trip then
        # overlap the next batches' decode instead of serializing at the end.
        # When batches come from the device cache there is no decode to overlap —
        # defer realization entirely and download ONE concatenated matrix per
        # model (one round trip total instead of one per batch).
        defer = self._device_batch_cache is not None and not self.time_models
        fetcher = None if defer else ThreadPoolExecutor(max_workers=1)
        try:
            self._run_fused_loop(batches, pending, metric_package, fetcher)
        finally:
            if fetcher is not None:
                fetcher.shutdown(wait=True)
        if collect is not None:  # commit only after a COMPLETE pass
            total = sum(getattr(v, 'nbytes', 0) for b in collect
                        for v in b.values() if hasattr(v, 'nbytes'))
            if total <= self._device_batch_cache_cap:
                self._device_batch_cache = collect
        if defer and pending:
            self._realize_pending_grouped(pending)
        for experiment, is_first, keys, fut, runtime, n in pending:
            vals = fut.result() if hasattr(fut, 'result') else fut
            rows = dict(zip(keys, np.asarray(vals)))
            for met in self.metrics:
                if is_first:
                    metric_package['LR>%s' % met].append(
                        [float(x) for x in rows['LR>%s' % met]])
                metric_package['%s>%s' % (experiment, met)].append(
                    [float(x) for x in rows['model>%s' % met]])
            if runtime is not None:
                if is_first:  # schema parity with the standard protocol; the LR
                    # prep is fused on device, so no host resize time exists
                    metric_package['LR>runtime'].append([float('nan')] * n)
                # whole-batch seconds repeated per row — identical semantics to the
                # standard protocol's model runtime column
                metric_package['%s>runtime' % experiment].append([runtime] * n)
        self.manipulate_and_save_metrics(metric_package)

    @staticmethod
    def _collecting_iter(batches, out):
        for b in batches:
            out.append(b)
            yield b

    @staticmethod
    def _realize_pending_grouped(pending):
        """Replace each pending entry's unrealized (K, N) device matrix with its
        host slice, downloading one concatenated matrix per (model, keys) group —
        the device tunnel charges a payload-independent ~31 ms per transfer, so
        per-batch downloads dominate the cached fast path."""
        import jax
        import jax.numpy as jnp
        groups = OrderedDict()
        for i, entry in enumerate(pending):
            groups.setdefault((entry[0], entry[2]), []).append(i)
        for idxs in groups.values():
            mats = [pending[i][3] for i in idxs]
            cat = mats[0] if len(mats) == 1 else jnp.concatenate(mats, axis=1)
            host = np.asarray(jax.device_get(cat))
            off = 0
            for i, mat in zip(idxs, mats):
                exp, first, keys, _, rt, n = pending[i]
                width = mat.shape[1]
                pending[i] = (exp, first, keys, host[:, off:off + width], rt, n)
                off += width

    def _run_fused_loop(self, batches, pending, metric_package, fetcher):
        import jax
        with tqdm(total=len(self.rgb_data)) as pbar:
            for batch in batches:
                im_names = batch['tag']
                self.images_processed += len(im_names)
                metric_package['Image_Name'].append(list(im_names))
                diag = ''
                for idx, model in enumerate(self.model_bundles):
                    (keys, vals), runtime = model.model.run_eval_fused(
                        batch, metrics=tuple(self.metrics), timing=self.time_models,
                        include_lr=idx == 0)
                    # no fetcher => deferred: the unrealized device matrix is
                    # downloaded later in one grouped transfer per model
                    fut = vals if fetcher is None \
                        else fetcher.submit(jax.device_get, vals)
                    pending.append((model.experiment, idx == 0, keys, fut,
                                    runtime, len(im_names)))
                    if runtime is not None and 'PSNR' in self.metrics:
                        # timing mode serializes anyway; reuse the fetched matrix
                        # rather than downloading it a second time
                        psnr_row = np.asarray(fut.result())[
                            keys.index('model>PSNR')]
                        diag += '%s PSNR: %.4f, ' % (model.experiment,
                                                     float(np.mean(psnr_row)))
                pbar.update(1)
                if diag:
                    pbar.set_description(diag[:-2])

    def full_image_protocol(self):
        """Full metrics run (ref: standard_eval.py:217-294)."""
        if self.fused_eval:
            if all(m.model.supports_fused_eval() for m in self.model_bundles):
                return self._fused_image_protocol()
            print('fused_eval: some models lack a fused path (bucketed eval) — '
                  'using the standard protocol.')
        # undo fused-run transport if a previous protocol call enabled it: this
        # path expects float, host-stacked batches
        for ds in getattr(self.rgb_data.dataset, 'datasets', [self.rgb_data.dataset]):
            ds.keep_uint8 = False
        self.rgb_data.device_collate = False
        self.interp_data = iter(self.interp_loader) if self.interp_loader else None
        metric_package = defaultdict(list)
        with tqdm(total=len(self.rgb_data)) as pbar:
            for index, batch in enumerate(self.rgb_data):
                lr_rgb, hr_rgb = batch['lr'], batch['hr']
                im_names, hr_names = batch['tag'], batch['hr_tag']
                self.images_processed += len(im_names)

                diag_string = ''
                probe_names = [n.split('.')[0] for n in list(im_names)]
                hr_names = [n.split('.')[0] for n in list(hr_names)]
                metric_package['Image_Name'].append(list(im_names))

                if self.interp_data:
                    interp_data = next(self.interp_data)['lr']
                else:
                    interp_data, timing_info = self._low_res_prep(
                        lr_rgb, timing=self.time_models)
                    if timing_info is not None:
                        # one true per-image resize time per row, so columns stay
                        # aligned AND honest at batch_size > 1 (the reference appends
                        # once per batch and crashes in manipulate_and_save_metrics
                        # for batch_size > 1)
                        metric_package['LR%sruntime' % self.metric_hub.delimeter].append(
                            timing_info)

                hr_prep = self._high_res_prep(hr_rgb)
                lr_prep = self._high_res_prep(interp_data)

                metric_slice, mini_diag = self.metric_hub.run_metrics(
                    lr_prep, references=hr_prep, key='LR', probe_names=hr_names)
                for key in metric_slice.keys():
                    metric_package[key].append(metric_slice[key])
                diag_string += mini_diag

                hr_rgb_fmt = None
                if self.face_metric:
                    hr_rgb_fmt = ModelInterface._standard_image_formatting(
                        np.asarray(hr_rgb))
                    metric_package['LR>FACE_SIM'].append(
                        self.metric_hub.run_image_metric(
                            'FACE_SIM',
                            ModelInterface._standard_image_formatting(
                                np.asarray(interp_data)),
                            hr_rgb_fmt, single_values=True))

                output_package = {}
                for model in self.model_bundles:
                    if 'rgb' in model.configuration['colorspace']:
                        selected_im = lr_rgb if model.configuration['input'] == \
                            'unmodified' else interp_data
                    else:
                        selected_im = lr_prep
                    rgb_im, ycbcr_im, _, timing = model.net_run_and_process(
                        **{**batch, **{'lr': selected_im}}, timing=self.time_models)
                    if timing is not None:
                        metric_package['%s%sruntime' % (
                            model.experiment, self.metric_hub.delimeter)].append(
                            [timing] * len(im_names))

                    metric_slice, mini_diag = self.metric_hub.run_metrics(
                        ycbcr_im, hr_prep, key=model.experiment, probe_names=hr_names)
                    for key in metric_slice.keys():
                        metric_package[key].append(metric_slice[key])
                    diag_string += mini_diag
                    if self.face_metric:
                        metric_package['%s>FACE_SIM' % model.experiment].append(
                            self.metric_hub.run_image_metric(
                                'FACE_SIM', rgb_im, hr_rgb_fmt, single_values=True))

                    output_package[model.experiment] = rgb_im
                    # NB reference parity (standard_eval.py:278, its own comment:
                    # "very crude"): images_processed is incremented BEFORE this
                    # check, so up to batch_size-1 fewer images are saved than
                    # num_image_save requests
                    if self.save_im and self.images_processed < self.num_image_save:
                        for im in im_names:
                            if os.sep in im:
                                create_dir_if_empty(os.path.join(
                                    self.save_folders[model.experiment],
                                    os.path.dirname(im)))
                        safe_image_save(rgb_im, self.save_folders[model.experiment],
                                        im_names, config='rgb')

                if not self.no_image_comparison \
                        and self.images_processed < self.num_image_save:
                    self._generate_image_collage(
                        interp_data, output_package, metrics=self.metrics,
                        metric_slice={k: metric_package[k][-1] for k in metric_package},
                        probe_names=probe_names, hr_rgb=hr_rgb)
                pbar.update(1)
                pbar.set_description(diag_string[:-2])

        self.manipulate_and_save_metrics(metric_package)

    def manipulate_and_save_metrics(self, metric_package):
        """MultiIndex CSV reports (ref: standard_eval.py:300-319)."""
        for key in metric_package.keys():
            metric_package[key] = list(itertools.chain.from_iterable(metric_package[key]))

        indexes = ['Image_Name', 'Image_ID'] if 'Image_ID' in metric_package \
            else ['Image_Name']
        full_results = pd.DataFrame.from_dict(metric_package).set_index(indexes)
        full_results.columns = pd.MultiIndex.from_tuples(
            [tuple(c.split('>')) for c in full_results.columns])
        av_results = self.average_multilevel_dataframe(full_results)

        metrics_dir = os.path.join(self.out_dir, 'standard_metrics')
        create_dir_if_empty(metrics_dir)
        full_results.to_csv(os.path.join(metrics_dir, 'individual_metrics.csv'))
        av_results.to_csv(os.path.join(metrics_dir, 'average_metrics.csv'))
        return full_results, av_results

    def average_multilevel_dataframe(self, dataframe):
        """(ref: standard_eval.py:321-326)"""
        r1 = dataframe.mean(axis=0).rename('Mean')
        r2 = dataframe.std(axis=0).rename('Std')
        results = pd.concat([r1, r2], axis=1)
        results = pd.DataFrame(results.stack()).T.stack(0).droplevel(level=0)
        return results
