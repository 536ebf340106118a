"""Client-side model interface: experiment directories, checkpoint selection, colorspace
post-processing (ref: Code/SISR/models/__init__.py:33-254 ModelInterface).

Device-selection semantics are reinterpreted TPU-natively: the reference's
``gpu='off'|'single'|'multi'`` becomes ``'off'`` -> default device (single chip),
``'single'`` -> specific device, ``'multi'`` -> data-parallel mesh over all local devices
(see sisr_tpu.parallel).  The CLI flags keep their reference names.
"""
import glob
import os

import numpy as np
import pandas as pd

from ..utils import toml_io
from ..utils.helpers import create_dir_if_empty
from ..ops.colorspace import ycbcr_convert
from .handlers import define_model


class ModelInterface:
    """(ref: models/__init__.py:33-254)"""

    def __init__(self, model_loc, experiment, gpu='off', sp_gpu=0, mode='eval',
                 new_params=None, load_epoch=None, scale=None, save_subdir=None,
                 new_branch=False):
        if save_subdir is not None:
            log_dir = os.path.join('result_outputs', save_subdir)
            save_dir = os.path.join('saved_models', save_subdir)
        else:
            log_dir = 'result_outputs'
            save_dir = 'saved_models'

        self.experiment = experiment
        self.base_folder = os.path.abspath(os.path.join(model_loc, experiment))
        self.logs = os.path.abspath(os.path.join(self.base_folder, log_dir))
        self.saved_models = os.path.abspath(os.path.join(self.base_folder, save_dir))
        self.mode = mode
        self.gpu = gpu

        load_override = os.path.dirname(self.saved_models) if new_branch else None

        if mode == 'train':
            create_dir_if_empty(self.base_folder, self.logs, self.saved_models)
            if new_params is None and load_epoch is None:
                raise RuntimeError('Need to specify model parameters to train a new model.')
        elif mode == 'eval':
            if load_epoch is None:
                raise RuntimeError('Need to specify which model epoch to load.')

        if load_epoch is None:
            self.model_epoch = 0
            self.metadata = new_params
        else:
            config_path = os.path.join(self.base_folder, 'config.toml')
            if not os.path.isfile(config_path):
                # resumed runs write config_from_epoch_N.toml (net_train.py): fall
                # back to the newest snapshot rather than crashing on the canonical
                # name the dir happens to lack
                snapshots = sorted(glob.glob(os.path.join(self.base_folder,
                                                          'config*.toml')),
                                   key=os.path.getmtime)
                if not snapshots:
                    raise RuntimeError('No config.toml found in %s - model structure '
                                       'unknown.' % self.base_folder)
                config_path = snapshots[-1]
            self.metadata = toml_io.load(config_path)['model']

        self.name = self.metadata['name']
        if self.name == 'qpircan':  # legacy conversion (ref: models/__init__.py:92-93)
            self.name = 'qrcan'

        internal = dict(self.metadata.get('internal_params') or {})
        if scale is not None:
            if internal.get('scale') is None:
                internal['scale'] = scale  # config omitted it: honor the request
            elif scale != internal['scale']:
                raise Exception('The model loaded has been trained for a different '
                                'scale, and cannot produce the requested images.')
        internal.pop('metadata_list', None)

        self.model = define_model(name=self.name,
                                  eval_mode=(mode == 'eval'), **internal)
        self.model.model_save_dir = self.saved_models

        if load_epoch is not None:
            if load_epoch in ('best', 'last'):
                # fence BEFORE the on-disk resolution walk below: a same-process
                # train->eval flow may still have the best epoch's background
                # write in flight, and resolving past it would silently load a
                # worse epoch (load_model's own fence runs too late to help)
                self.model.wait_pending_checkpoints()
                summary = pd.read_csv(os.path.join(self.logs, 'summary.csv'))
                # resolve through the 'epoch' column, not row position: resumed /
                # branched runs can leave stale duplicate-epoch rows appended to
                # summary.csv, where idxmax/row-count would pick the wrong checkpoint
                if load_epoch == 'best':
                    rows = summary['val-PSNR'].sort_values(ascending=False).index
                else:
                    rows = summary.index[::-1]
                candidates = [int(summary['epoch'].loc[r]) if 'epoch' in summary
                              else int(r) for r in rows]
                # summary.csv rows are written before the (background) checkpoint
                # write is durable, and cleanup may since have deleted epochs: walk
                # the ranking and take the first checkpoint actually on disk
                missing = []
                for cand in candidates:
                    if os.path.exists(os.path.join(self.saved_models,
                                                   'train_model_%d' % cand)):
                        break
                    missing.append(cand)
                else:
                    raise FileNotFoundError(
                        'summary.csv lists epochs %s but no corresponding '
                        'train_model_* checkpoint exists in %s'
                        % (candidates, self.saved_models))
                if missing:
                    print('WARNING: %r epoch(s) %s have no checkpoint on disk '
                          '(failed/cleaned save?) — loading epoch %d instead.'
                          % (load_epoch, missing, cand))
                load_epoch = cand
            self.model_epoch = load_epoch
            self.model.load_model(model_save_name='train_model', model_idx=load_epoch,
                                  model_save_dir=self.saved_models,
                                  load_override=load_override)
        else:
            self.model.pre_training_model_load()

        if gpu == 'multi':  # data-parallel mesh over all local (or pod) devices
            import jax
            from ..parallel import MeshContext, make_multihost_mesh
            if jax.process_count() > 1:
                # multi-process launch (the CLI entry called maybe_init_distributed
                # before any jax work): hierarchical (dcn, data) mesh over the pod
                self.model.set_mesh(make_multihost_mesh())
            else:
                self.model.set_mesh(MeshContext())
        elif gpu in ('single', True) and sp_gpu:
            # pin single-device runs to the REQUESTED chip (the reference's sp_gpu,
            # models/__init__.py:79-84): without this, two "single-device" jobs
            # pinned to different chips silently contended on device 0
            import jax
            devices = jax.devices()
            if int(sp_gpu) >= len(devices):
                # the reference DEFAULTS sp_gpu to 1, so out-of-range must degrade
                # (a 1-chip host would otherwise refuse every default-config run)
                print('sp_gpu=%s requested but only %d device(s) visible — using '
                      'device 0.' % (sp_gpu, len(devices)))
            else:
                jax.config.update('jax_default_device', devices[int(sp_gpu)])

        self.full_name = '%s_%d' % (experiment, self.model_epoch)
        self.configuration = {'input': self.model.im_input,
                              'colorspace': self.model.colorspace}
        self.print_overview()

    # --- training/eval passthrough -------------------------------------------------------
    def train_batch(self, lr, hr, metadata=None, metadata_keys=None, blur_kernels=None,
                    **kwargs):
        if metadata_keys is not None and self.model.metadata_keys is None:
            self.model.set_metadata_keys(metadata_keys)
        return self.model.run_train(lr=lr, hr=hr, metadata=metadata,
                                    blur_kernels=blur_kernels,
                                    _shard_factor=kwargs.get('_shard_factor', 1))

    def train_batch_multi(self, batches):
        """Fused K-step dispatch (see BaseHandler.run_train_multi).  ``batches`` is a
        list of K batch dicts, or a pre-stacked (K, B, ...) dict from the staged
        uploader."""
        first = batches if isinstance(batches, dict) else (batches[0] if batches else {})
        if first.get('metadata_keys') is not None and self.model.metadata_keys is None:
            self.model.set_metadata_keys(first['metadata_keys'])
        return self.model.run_train_multi(batches)

    def set_epoch(self, epoch):
        self.model_epoch = epoch
        self.model.set_epoch(epoch)

    def set_metadata_keys(self, keys):
        self.model.set_metadata_keys(keys)

    def net_run_and_process(self, lr=None, hr=None, metadata=None, metadata_keys=None,
                            request_loss=False, timing=False, **kwargs):
        """Run eval + colorspace post-processing (ref: models/__init__.py:138-156).

        Images are N,H,W,C float arrays in [0,1]; ycbcr models receive/return Y-channel
        data and are recombined with the LR chroma.
        """
        if metadata_keys is not None and self.model.metadata_keys is None:
            self.model.set_metadata_keys(metadata_keys)

        if 'rgb' in self.configuration['colorspace']:
            out_rgb, loss, timing_out = self.model.run_eval(
                lr, hr, request_loss=request_loss, metadata=metadata, timing=timing)
            out_ycbcr = self.colorspace_convert(out_rgb, colorspace='rgb')
            out_rgb = self._standard_image_formatting(out_rgb)
        else:
            f_ref = None if hr is None else hr[..., :1]
            out_y, loss, timing_out = self.model.run_eval(
                lr[..., :1], f_ref, request_loss=request_loss, metadata=metadata,
                timing=timing)
            out_ycbcr = np.concatenate([out_y, np.asarray(lr[..., 1:], np.float32)],
                                       axis=-1)
            out_rgb = self.colorspace_convert(out_ycbcr, colorspace='ycbcr')
            out_ycbcr = self._standard_image_formatting(out_ycbcr)

        return out_rgb, out_ycbcr, loss, timing_out

    @staticmethod
    def colorspace_convert(image, colorspace='rgb'):
        """Batch NHWC colorspace conversion with [0,1] clipping
        (ref: models/__init__.py:158-163)."""
        processed = ModelInterface._standard_image_formatting(np.asarray(image))
        out = np.empty_like(processed)
        for i in range(processed.shape[0]):
            chw = processed[i].transpose(2, 0, 1)
            conv = ycbcr_convert(chw, im_type='jpg', input=colorspace, y_only=False)
            out[i] = conv.transpose(1, 2, 0)
        return out

    @staticmethod
    def _standard_image_formatting(im, min_value=0, max_value=1):
        return np.clip(np.array(im, copy=True), min_value, max_value)

    def net_forensic(self, data, metadata=None, metadata_keys=None, **kwargs):
        """Forward + attention introspection (ref: models/__init__.py:171-173)."""
        if metadata_keys is not None and self.model.metadata_keys is None:
            self.model.set_metadata_keys(metadata_keys)
        image, forensic_data = self.model.run_forensic(data, metadata=metadata)
        return image, forensic_data

    # --- persistence ----------------------------------------------------------------------
    def save(self, name='train_model', override=False, dry_run=False):
        save_path = os.path.join(self.saved_models,
                                 '{}_{}'.format(name, str(self.model_epoch)))
        pending = save_path in getattr(self.model, 'pending_checkpoint_paths', lambda: ())()
        if (os.path.exists(save_path) or pending) and not override:
            # file (msgpack), dir (orbax), or a background write still in flight
            raise RuntimeError('Saving this model will result in overwriting existing '
                               'data!  Change model location or enable override.')
        if not dry_run:
            self.model.save_model(model_save_name=name, model_idx=self.model_epoch,
                                  model_save_dir=self.saved_models)
        else:
            print('Training cleared to run.')

    def save_metadata(self):
        md = pd.DataFrame.from_dict(
            {'model_parameters': [self.model.print_parameters()]})
        md.to_csv(os.path.join(self.base_folder, 'extra_metadata.csv'), index=False)

    def print_overview(self):
        """(ref: models/__init__.py:195-223)"""
        import jax
        if self.mode == 'eval':
            pmode, epoch, message = 'eval', self.model_epoch, 'currently evaluating'
        else:
            pmode = 'train'
            epoch = self.model_epoch if self.model_epoch == 0 else self.model_epoch + 1
            message = 'will start training from'
        print('----------------------------')
        print('Handler for experiment %s initialized successfully.' % self.experiment)
        print('System loaded in %s mode - %s architecture provided.' % (pmode, self.name))
        print('Model has %d trainable parameters.' % self.model.print_parameters())
        device = jax.devices()[0]
        print("Using %s as the model's primary device, and %s epoch %d of the model."
              % (device, message, epoch))
        self.model.extra_diagnostics()
        print('----------------------------')

    @staticmethod
    def define_model(name, **kwargs):
        return define_model(name, **kwargs)

    def epoch_end_calls(self):
        self.model.epoch_end_calls()

    def wait_pending_checkpoints(self, timeout=None):
        """Fence for background checkpoint writes (see BaseHandler.save_model)."""
        self.model.wait_pending_checkpoints(timeout=timeout)

    def get_learning_rate(self):
        return self.model.get_learning_rate()
