"""TrainingHandler: the experiment orchestration loop
(ref: Code/SISR/training/training_handler.py:25-323).

TPU-native changes vs the reference: batches stream through a device-prefetch queue
(next batch transferring while the current step runs), the train step is one jitted XLA
program, and 'gpu' selects device/mesh placement instead of CUDA devices.
"""
from collections import defaultdict
from datetime import date
import math
import os
import random
import time

import numpy as np
import tqdm

from ..configuration import constants as sconst
from ..data.loader import device_prefetch
from ..data.setup import sisr_data_setup
from ..models.interface import ModelInterface
from ..ops.metrics import Metrics
from ..tools.stats import save_statistics, plot_stats, legacy_load_statistics
from ..tools.visualization import safe_image_save
from ..utils.helpers import create_dir_if_empty


class TrainingHandler:
    def __init__(self,
                 experiment_name='experiment-%s' % date.today().strftime("%b-%d-%Y"),
                 save_loc=sconst.results_directory, aim_track=False, aim_home=None,
                 model_params=None, gpu='off', sp_gpu=1, data_params=None,
                 num_epochs=None, continue_from_epoch=None, max_im_val=1.0, metrics=None,
                 seed=8, model_cleanup_frequency=None, epoch_cutoff=None,
                 early_stopping_patience=None, overwrite_data=False, branch_start=None,
                 new_branch=False, logging='visual', save_samples=True,
                 experiment_group=None, steps_per_dispatch=None, fused_val=False,
                 **kwargs):
        """Parameter semantics follow the reference (training_handler.py:39-63)."""
        # on multi-process launches every host runs the same SPMD loop; only rank 0
        # owns filesystem writes (checkpoints, CSVs, plots, samples, tracking)
        from ..parallel.distributed import is_primary_host
        self._primary = is_primary_host()
        self.experiment_name = experiment_name
        self.num_epochs = num_epochs
        self.logging = logging
        self.save_samples = save_samples and self._primary
        self.stop_patience = early_stopping_patience
        self.overwrite = overwrite_data
        self.model_cleanup_frequency = model_cleanup_frequency
        self.aim_track = aim_track
        # fuse K optimizer steps into one device dispatch (lax.scan) — amortizes
        # dispatch latency; requires fixed-size training batches (crops)
        self.steps_per_dispatch = steps_per_dispatch or 1
        # run the validation epoch as fused device programs (forward + YCbCr +
        # PSNR/SSIM + loss on device, one scalar row-matrix per batch) — the
        # training-time analog of `eval_sisr --fused_eval`
        self.fused_val = bool(fused_val)
        self._fused_val_warned = False
        self.tracker = None

        # host RNG seeding (ref: training_handler.py:76-79); the model's jax PRNG seed is
        # threaded via model internal params
        np.random.seed(seed)
        random.seed(seed)

        self.best_val_model_idx = 0
        self.best_val_model_psnr = 0
        self.model_name = model_params['name']
        self.max_im_val = max_im_val
        self.branch_off = new_branch

        if new_branch and continue_from_epoch is not None:
            branch_name = 'branch_epoch_%d' % continue_from_epoch
            subdir = branch_name if branch_start is None \
                else os.path.join(branch_start, branch_name)
        else:
            subdir = branch_start

        self.model = ModelInterface(save_loc, experiment_name, gpu=gpu, sp_gpu=sp_gpu,
                                    mode='train', new_branch=self.branch_off,
                                    new_params=model_params,
                                    load_epoch=continue_from_epoch, save_subdir=subdir)

        self.starting_epoch = self.model.model_epoch
        if continue_from_epoch is not None:
            # resume trains the epoch AFTER the loaded checkpoint; keying on the
            # loaded epoch number instead (like the reference, training_handler.py:
            # 106-109) made continue_from_epoch=0 silently RETRAIN epoch 0
            self.starting_epoch += 1

        if epoch_cutoff is not None:
            self.num_epochs = epoch_cutoff - self.starting_epoch
            print('Epoch count set to %d' % self.num_epochs)

        train_data, val_data = sisr_data_setup(
            scale=model_params['internal_params']['scale'],
            **self.model.configuration, qpi_sort=False, **data_params)
        self.train_data = train_data
        self.val_data = val_data
        self.model.set_metadata_keys(getattr(train_data.dataset, 'metadata_keys', []))
        if getattr(train_data.dataset, 'device_degradations', False):
            self.model.model.set_device_degrade(True)
        if 'rgb' in self.model.configuration['colorspace']:
            # uint8 training transport: rgb-family models upload u8 crops (4x less
            # tunnel traffic, the measured epoch bound); /255 runs inside the jitted
            # step (BaseHandler._prep_batch), bit-identical to the host conversion.
            # ycbcr datasets ignore the flag (their guard needs the float pipeline).
            for ds in getattr(train_data.dataset, 'datasets',
                              [train_data.dataset]):
                ds.keep_uint8 = True

        self.metric_hub = Metrics(metrics) if metrics is not None else None

        if aim_track and self._primary:
            # Aim itself is not installable here; runs are tracked to JSONL streams with
            # the same API surface (see tools/tracker.py)
            from datetime import datetime
            from ..tools.tracker import JsonlTracker
            if continue_from_epoch is None:
                run_name = experiment_name + '_%s' % datetime.today().strftime(
                    "%Hh-%Mm-%Ss-%b-%d-%Y")
            else:
                run_name = 'continuation_from_epoch_%d_' % self.model.model_epoch \
                    + experiment_name
            home = aim_home or os.path.join(save_loc, 'tracking')
            self.tracker = JsonlTracker(experiment=experiment_name, repo=home,
                                        run=run_name)
            self.tracker.set_params(dict(model_params), name='model_parameters')
            self.tracker.set_params({'num_epochs': num_epochs,
                                     'continue_from_epoch': continue_from_epoch,
                                     'seed': seed, 'epoch_cutoff': epoch_cutoff},
                                    name='train_parameters')

    def _stack_group(self, buffer):
        """Stack the train-step arrays of K same-shape batches into (K, B, ...) host
        arrays — one device transfer per K-step dispatch; non-array entries
        (metadata_keys, tags) pass through from the first batch.  Only the keys the
        train step actually consumes (BaseHandler._train_batch_keys) are stacked, so
        e.g. host-degradation blur_kernels never ride the tunnel."""
        out = {k: v for k, v in buffer[0].items()
               if not (isinstance(v, np.ndarray) and v.dtype != object)}
        for k in self.model.model._train_batch_keys():
            v = buffer[0].get(k)
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = np.stack([np.asarray(b[k]) for b in buffer], axis=0)
        out['_multi'], out['_count'] = True, len(buffer)
        return out

    def train(self):
        """One training epoch (ref: training_handler.py:147-177)."""
        import jax
        current_epoch_losses = defaultdict(list)
        with tqdm.tqdm(total=len(self.train_data)) as pbar_train:
            # Losses realize in CHUNKS of dispatches through one jax.device_get:
            # every separate download pays a full tunnel round trip (~31 ms measured,
            # payload-independent), so realizing per dispatch would serialize an RTT
            # behind each step.  The loss display lags by <= chunk dispatches.
            pending = []

            def drain(force=False):
                if not pending or (not force and len(pending) < 8):
                    return
                vals = jax.device_get(pending)  # ONE round trip for the chunk
                pending.clear()
                flat = [float(v) for arr in vals for v in np.atleast_1d(arr)]
                current_epoch_losses['train-loss'].extend(flat)
                pbar_train.set_description("loss: {:.4f}".format(flat[-1]))

            def queue(losses):
                pending.append(losses)
                drain()

            if self.steps_per_dispatch > 1:
                # Group K same-shape batches per dispatch; stack full groups on host
                # so the uploader thread ships ONE (K, B, ...) transfer per dispatch
                # (device_prefetch), overlapping the upload with device compute.
                # Ragged batches (the final short one) run as single steps.
                def single(batch):
                    # same key filter as _stack_group: arrays the train step
                    # discards (host-degradation blur_kernels, masks) must not
                    # ride the tunnel through the prefetcher
                    keys = self.model.model._train_batch_keys()
                    out = {k: v for k, v in batch.items()
                           if k in keys or not (isinstance(v, np.ndarray)
                                                and v.dtype != object)}
                    out['_multi'], out['_count'] = False, 1
                    return out

                def grouped():
                    buffer = []
                    expected_sig = None
                    for batch in self.train_data:
                        # K-step scan needs K identically-SHAPED batches: compare
                        # image shapes, not just the batch count (variable-size
                        # images at batch_size=1 must fall back to single steps,
                        # not crash np.stack inside _stack_group)
                        if isinstance(batch.get('hr'), (list, tuple)) or \
                                isinstance(batch.get('lr'), (list, tuple)):
                            # ragged within ONE batch: single-step so run_train can
                            # raise its crop/batch_size guidance
                            yield single(batch)
                            continue
                        # factor is part of the signature: a ragged-tail batch that
                        # every rank loaded whole must not stack with process-local
                        # shards of the same shape
                        sig = (np.shape(batch.get('hr')), np.shape(batch.get('lr')),
                               batch.get('_shard_factor', 1))
                        if expected_sig is None:
                            expected_sig = sig
                        if sig != expected_sig:
                            yield single(batch)
                            continue
                        buffer.append(batch)
                        if len(buffer) == self.steps_per_dispatch:
                            yield self._stack_group(buffer)
                            buffer = []
                    for batch in buffer:  # ragged tail: single steps
                        yield single(batch)

                staged = self._mesh_free()
                iterator = device_prefetch(grouped()) if staged else grouped()
                for batch in iterator:
                    multi, n = batch.pop('_multi'), batch.pop('_count')
                    if multi:
                        queue(self.model.train_batch_multi(batch))
                    else:
                        queue(self.model.train_batch(**batch)[0])
                    pbar_train.update(n)
            else:
                staged = self._mesh_free()
                iterator = device_prefetch(self.train_data) if staged \
                    else self.train_data
                for batch in iterator:
                    queue(self.model.train_batch(**batch)[0])
                    pbar_train.update(1)
            drain(force=True)

        learning_rates = self.model.get_learning_rate()
        current_epoch_losses['learning-rate'].append(learning_rates)
        self.model.epoch_end_calls()
        return current_epoch_losses

    def _mesh_free(self):
        """True when no device mesh is set: the single-source rule for whether
        host batches may be staged to the DEFAULT device before the handler
        (prefetch/device_collate) — under a mesh, sharded placement happens
        inside run_train/run_train_multi/run_eval_fused and staging first would
        force a device->host->device round trip per batch."""
        return getattr(self.model.model, 'mesh_ctx', None) is None

    def _use_fused_val(self):
        if not self.fused_val:
            return False
        handler = self.model.model
        metrics = self.metric_hub.metrics if self.metric_hub is not None else []
        ok = (handler.supports_fused_eval()
              and 'rgb' in self.model.configuration['colorspace']
              and float(self.max_im_val) == 1.0  # fused metrics fix max_val=1
              and set(metrics) <= {'PSNR', 'SSIM'})
        if not ok and not self._fused_val_warned:
            print('fused_val: unsupported for this model/metric set — using the '
                  'standard validation path.')
            self._fused_val_warned = True
        return ok

    def _fused_eval_epoch(self, epoch_idx):
        """Validation epoch with the whole per-batch pipeline fused on device
        (forward + YCbCr + PSNR/SSIM + loss in one program; see
        BaseHandler.run_eval_fused).  Metric and loss semantics match the standard
        path — asserted by tests/test_e2e.py::test_fused_val_matches_host.
        Batches dispatch asynchronously; the scalar row-matrices are realized once at
        epoch end, so the host never blocks mid-epoch."""
        import jax
        current_epoch_losses = defaultdict(list)
        metrics = tuple(self.metric_hub.metrics) if self.metric_hub is not None else ()
        # u8 transport + device-side stacking + upload prefetch: the host f32
        # conversion (25 MB written per batch of 8 HR 512^2) and collate memcpy are
        # the val epoch's measured host costs; run_eval_fused redoes /255 on device,
        # bit-identically (same as the fused eval CLI path)
        for ds in getattr(self.val_data.dataset, 'datasets', [self.val_data.dataset]):
            ds.keep_uint8 = True
        mesh_free = self._mesh_free()
        self.val_data.device_collate = mesh_free

        def stream():
            # run_eval_fused consumes only lr/hr/metadata (+tag for naming): don't
            # ship mask/halfway/blur_kernels arrays over the tunnel every batch
            for b in iter(self.val_data):
                yield {k: v for k, v in b.items()
                       if k not in ('mask', 'halfway_data', 'blur_kernels')}

        iterator = device_prefetch(stream()) if mesh_free else stream()
        # result rows download on a background thread as each batch dispatches, so
        # the compute wait + download RTT overlap the next batches' decode/upload
        from concurrent.futures import ThreadPoolExecutor
        # context manager: an exception mid-epoch must not leak the worker thread
        # and its pending device_get futures (which pin result arrays)
        with ThreadPoolExecutor(max_workers=1) as fetcher, \
                tqdm.tqdm(total=len(self.val_data)) as pbar_val:
            pending = []
            for index, batch in enumerate(iterator):
                (keys, vals), _ = self.model.model.run_eval_fused(
                    batch, metrics=metrics, include_lr=False, request_loss=True)
                pending.append((keys, fetcher.submit(jax.device_get, vals)))
                if index == 0 and self.save_samples:
                    # sample dump needs the SR image on host: run the standard path
                    # for this one batch (ref: training_handler.py:210-214).  The
                    # fused transport serves uint8 (and possibly device arrays);
                    # the host path expects float [0,1]
                    def _f32(im):
                        arr = np.asarray(im)
                        return arr.astype(np.float32) / 255.0 \
                            if arr.dtype == np.uint8 else arr
                    names = [name.replace(os.sep, '_') for name in batch['tag']]
                    if isinstance(batch['lr'], (list, tuple)) or \
                            getattr(batch['lr'], 'dtype', None) == object:
                        # ragged (mixed-size, bs>1) batch: the host path can't stack
                        # it — dump the first image only
                        sb = {'lr': _f32(batch['lr'][0])[None],
                              'hr': _f32(batch['hr'][0])[None]}
                        if batch.get('metadata') is not None:
                            sb['metadata'] = np.asarray(batch['metadata'])[:1]
                        names = names[:1]
                    else:
                        sb = dict(batch, lr=_f32(batch['lr']),
                                  hr=_f32(batch['hr']))
                    rgb_out, _, _, _ = self.model.net_run_and_process(**sb)
                    samples_folder = os.path.join(self.model.logs,
                                                  'epoch_%d_samples' % epoch_idx)
                    create_dir_if_empty(samples_folder)
                    safe_image_save(rgb_out, samples_folder, names, config='rgb')
                pbar_val.update(1)
        # exiting the `with` joined the fetcher: all rows fetched (overlapped)
        for keys, fut in pending:
            rows = dict(zip(keys, np.asarray(fut.result())))
            # rectangular batches replicate the batch-mean loss per image (mean is a
            # no-op); ragged fallbacks carry true per-image losses (mean aggregates)
            current_epoch_losses['val-loss'].append(float(np.mean(rows['model>loss'])))
            for met in metrics:
                current_epoch_losses['val-%s' % met].extend(
                    float(v) for v in rows['model>%s' % met])
        if pending and 'PSNR' in metrics:
            print('val PSNR: %.4f' % np.mean(current_epoch_losses['val-PSNR']))
        return current_epoch_losses

    def eval(self, epoch_idx):
        """One validation epoch (ref: training_handler.py:179-224)."""
        if self._use_fused_val():
            return self._fused_eval_epoch(epoch_idx)
        # undo fused-val transport if a previous epoch enabled it: the standard path
        # expects float batches and host-stacked arrays
        for ds in getattr(self.val_data.dataset, 'datasets', [self.val_data.dataset]):
            ds.keep_uint8 = False
        self.val_data.device_collate = False
        current_epoch_losses = defaultdict(list)
        metric_package = {}
        with tqdm.tqdm(total=len(self.val_data)) as pbar_val:
            for index, batch in enumerate(self.val_data):
                y, im_names = batch['hr'], batch['tag']
                rgb_out, ycbcr_out, loss, timing = self.model.net_run_and_process(
                    **batch, request_loss=True)

                if 'rgb' in self.model.configuration['colorspace']:
                    y_proc = self.model.colorspace_convert(y, colorspace='rgb')
                else:
                    y_proc = self.model._standard_image_formatting(np.asarray(y))

                current_epoch_losses["val-loss"].append(loss)
                if self.metric_hub is not None:
                    metric_package, _ = self.metric_hub.run_metrics(
                        ycbcr_out, references=y_proc, max_value=self.max_im_val,
                        key='val',
                        probe_names=[n.split('.')[0] for n in im_names])
                    for metric, result in metric_package.items():
                        current_epoch_losses[metric].extend(result)

                if index == 0 and self.save_samples:
                    samples_folder = os.path.join(self.model.logs,
                                                  'epoch_%d_samples' % epoch_idx)
                    create_dir_if_empty(samples_folder)
                    names = [name.replace(os.sep, '_') for name in im_names]
                    safe_image_save(rgb_out, samples_folder, names, config='rgb')

                pbar_val.update(1)
                diag_string = 'loss: {:.4f}, '.format(loss)
                for metric in metric_package.keys():
                    diag_string += '{}: {:.4f}, '.format(
                        metric, np.mean(metric_package[metric]))
                pbar_val.set_description(diag_string[:-2])
        return current_epoch_losses

    def run_experiment(self):
        """Full training run (ref: training_handler.py:226-323)."""
        if self.model.mode == 'eval':
            raise RuntimeError('Model initialized in eval mode, training not possible.')

        total_losses = defaultdict(list)
        if self.starting_epoch != 0 and self._primary:
            # summary.csv only exists where rank 0 wrote it; non-primary hosts keep
            # empty stats (they never write plots/CSVs anyway)
            logs = os.path.dirname(self.model.logs) if self.branch_off else self.model.logs
            loaded = legacy_load_statistics(logs, 'summary.csv')
            if 'epoch' in loaded:
                # resuming (or branching) from an earlier epoch REWRITES history:
                # rows for the resumed-over epochs are stale and would pollute the
                # summary and best-epoch selection (the reference keeps them
                # verbatim, training_handler.py:236-241 — fixed, not ported)
                keep = [i for i, e in enumerate(loaded['epoch'])
                        if e < self.starting_epoch]
                if len(keep) != len(loaded['epoch']):
                    loaded = {k: [v[i] for i in keep] for k, v in loaded.items()}
                    # the FILE still holds the stale rows: rewrite it from the
                    # truncated history on the first save of this run
                    self._rewrite_stats = True
            total_losses = defaultdict(list, loaded)
            if loaded.get('val-PSNR') \
                    and not np.all(np.isnan(loaded['val-PSNR'])):
                # resume continues the best-PSNR race instead of restarting it at 0
                # (the reference resets, deferring early stopping by up to patience
                # extra epochs after every resume).  All-NaN history (PSNR metric
                # added mid-run, resumed-over rows truncated to the NaN backfill)
                # skips the seed — nanargmax would raise on an all-NaN slice.
                best_row = int(np.nanargmax(loaded['val-PSNR']))
                self.best_val_model_psnr = loaded['val-PSNR'][best_row]
                self.best_val_model_idx = int(loaded['epoch'][best_row]) \
                    if 'epoch' in loaded else best_row

        try:
            result = self._epoch_loop(total_losses)
        except BaseException:
            # drain the queued writes for durability, but never let a checkpoint
            # error (or the drain itself) mask the PRIMARY failure — the operator
            # needs the root cause, with any write failure as a secondary warning.
            # The drain is BOUNDED (a wedged device transport is a likely cause of
            # the primary failure, and its writes would never finish) and catches
            # BaseException so a Ctrl-C during the drain still surfaces the
            # original traceback (the raise below honors the stop intent).
            try:
                self.model.wait_pending_checkpoints(timeout=120)
            except BaseException as ckpt_err:
                import sys
                print('WARNING: background checkpoint writes also failed/stalled '
                      'during shutdown: %r' % (ckpt_err,), file=sys.stderr)
            raise
        # background checkpoint writes must be durable before the run is
        # reported complete (and before any caller evals the saved epochs)
        self.model.wait_pending_checkpoints()
        return result

    def _epoch_loop(self, total_losses):
        improvement_count = 0
        for i, epoch_idx in enumerate(range(self.starting_epoch,
                                            self.starting_epoch + self.num_epochs)):
            epoch_start_time = time.time()
            print('Running epoch', epoch_idx)
            self.model.set_epoch(epoch_idx)

            if i == 0:
                self.model.save(override=self.overwrite, dry_run=True)

            print('Training Run:')
            training_loss = self.train()
            print('Validation Run:')
            eval_loss = self.eval(epoch_idx)
            current_epoch_losses = {**training_loss, **eval_loss}

            if 'val-PSNR' in current_epoch_losses:
                val_mean_psnr = np.mean(current_epoch_losses['val-PSNR'])
                if val_mean_psnr > self.best_val_model_psnr:
                    self.best_val_model_psnr = val_mean_psnr
                    self.best_val_model_idx = epoch_idx
                    improvement_count = 0
                else:
                    improvement_count += 1
            # without a tracked val-PSNR there is no improvement signal: the patience
            # counter must not tick, or it would silently stop a healthy run

            n_rows = len(total_losses['epoch'])
            for key, value in current_epoch_losses.items():
                avg_val = np.nanmean(value)
                if math.isnan(avg_val):
                    avg_val = 0
                if len(total_losses[key]) < n_rows:
                    # metric introduced mid-run (resume with a different metric
                    # set): backfill history with NaN so rows stay rectangular —
                    # ragged lists crash both plot_stats and the CSV writer
                    total_losses[key] = [float('nan')] * n_rows + total_losses[key]
                total_losses[key].append(avg_val)
                if self.tracker is not None:
                    self.tracker.track(avg_val, name=key.replace('-', '_'),
                                       epoch=epoch_idx)
            total_losses['epoch'].append(epoch_idx)
            for key, value in total_losses.items():
                if len(value) < n_rows + 1:  # metric dropped mid-run: pad forward
                    value.extend([float('nan')] * (n_rows + 1 - len(value)))

            if self.logging == 'visual' and self._primary:
                plot_stats(stats_dict=total_losses,
                           keynames=[['train-loss', 'val-loss'], ['val-PSNR'],
                                     ['val-SSIM']],
                           experiment_log_dir=self.model.logs, filename='loss_plots.pdf')

            if self._primary:
                self.model.save(override=self.overwrite)

                if getattr(self, '_rewrite_stats', False):
                    # first save after a resume-from-earlier: replace the file so
                    # its stale resumed-over rows don't survive on disk
                    save_statistics(experiment_log_dir=self.model.logs,
                                    filename='summary.csv',
                                    stats_dict=total_losses, append=False)
                    self._rewrite_stats = False
                else:
                    save_statistics(experiment_log_dir=self.model.logs,
                                    filename='summary.csv', stats_dict=total_losses,
                                    selected_data=epoch_idx
                                    if (self.starting_epoch != 0 or i > 0) else None,
                                    append=True if (self.starting_epoch != 0 or i > 0)
                                    else False)

            out_string = " ".join(["{}_{:.4f}".format(key, np.mean(value))
                                   for key, value in current_epoch_losses.items()])

            if self._primary and self.model_cleanup_frequency is not None and i != 0 \
                    and i % self.model_cleanup_frequency == 0:
                from ..tools.helper_cli import clean_models
                # fence: cleanup deletes checkpoint files by directory listing, so
                # every background write must be on disk (and considered) first
                self.model.wait_pending_checkpoints()
                clean_models(self.model.base_folder, clean_samples=True)

            if self.tracker is not None:
                self.tracker.track(time.time() - epoch_start_time, name='epoch_time',
                                   epoch=epoch_idx)
            epoch_elapsed_time = "{:.4f}".format(time.time() - epoch_start_time)
            print("Epoch {}/{}:".format(epoch_idx,
                                        self.starting_epoch + self.num_epochs - 1),
                  out_string, "Epoch duration:", epoch_elapsed_time, "seconds")
            print('-------------')

            if self.stop_patience is not None \
                    and improvement_count >= max(1, self.stop_patience):
                # >= max(1, ...): patience=0 used to stop after the FIRST epoch even
                # when it improved (0 == 0 before any non-improvement was seen)
                print('Stopping model training, validation PSNR has plateaued.')
                break

        return total_losses
