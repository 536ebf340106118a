"""AOT serving export: freeze a trained experiment into a single StableHLO artifact.

A deployment story the torch reference (which serves by re-instantiating the Python
model class and loading a ``.pth``) has no equivalent for: ``export_serving`` loads
an experiment checkpoint, closes the forward pass over its weights, and serializes
the whole thing — weights, metadata selection, u8 prep, graph — with
``jax.export``.  The resulting file needs only jax (no sisr_tpu, no model code,
no checkpoint) to serve:

    from jax import export
    fn = export.deserialize(open('edsr.sisr-hlo', 'rb').read()).call
    sr = fn(lr_batch)                      # or fn(lr_batch, metadata) for q-models

Export shapes are static per artifact (XLA serving reality: one compiled program
per shape); export several shapes — or shape-bucket upstream (``--eval_buckets``
pads to a handful of shapes) — for mixed-size serving.  ``--platform`` may be
repeated to produce one multi-platform artifact (e.g. export on CPU, serve on TPU).

``--int8`` freezes the QUANTIZED serving program instead (ops/quantization.py:
per-channel int8 conv spine at 2x the bf16 MXU rate, attention stages f32, static
activation scales) — weights ship as int8 constants, so the artifact is ~4x
smaller.  Activation scales are calibrated on REAL images: pass
``--calibration_images`` (a directory of PNGs; metadata models also read its
``degradation_metadata.csv``, the data-layer contract).
"""
import os

import click
import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

FILE_SUFFIX = '.sisr-hlo'


def build_serving_fn(handler):
    """A pure forward closed over the handler's weights and metadata plumbing.

    Contract: ``fn(x)`` or ``fn(x, metadata)`` with x NHWC float32 in [0,1] (or
    uint8 0-255 — the same transport prep as the jitted eval step, handlers.py
    ``_prep_batch``) and metadata (B, num_keys) float32; returns SR NHWC float32.
    """
    state = handler.state
    if state is None:
        raise RuntimeError('handler has no state - load a checkpoint first')

    def fn(x, metadata=None):
        batch = {'lr': x}
        if metadata is not None:
            batch['metadata'] = metadata
        xx, _, meta = handler._prep_batch(batch)
        variables = {'params': state.params}
        kwargs = {}
        if meta is not None:
            kwargs['metadata'] = meta
        if handler.has_batch_stats:
            variables['batch_stats'] = state.batch_stats
            kwargs['train'] = False
        return state.apply_fn(variables, xx, **kwargs).astype(jnp.float32)

    return fn


def build_int8_serving_fn(handler):
    """The quantized serving forward, closed over the calibrated int8 context.

    Same contract as :func:`build_serving_fn` (x f32 [0,1] or uint8 0-255,
    optional (B, num_keys) metadata) but the conv spine runs as int8 MXU ops
    with static calibrated activation scales; weights serialize as int8
    constants.  Requires ``handler.set_int8(True)`` plus a calibration batch
    through ``_ensure_int8_ctx`` before export (see ``export_experiment``)."""
    if handler.state is None:
        raise RuntimeError('handler has no state - load a checkpoint first')
    if handler._int8_ctx is None:
        raise RuntimeError('int8 export needs a calibrated context — set_int8(True) '
                           'and run _ensure_int8_ctx on a real calibration batch '
                           'first (the CLI does this via --calibration_images)')
    fwd, qp = handler._int8_ctx

    def fn(x, metadata=None):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        x = x.astype(jnp.float32)
        meta = handler.prepare_metadata(x, metadata) if handler.uses_metadata \
            else None
        return fwd(qp, x, meta).astype(jnp.float32)

    return fn


def _key_counts(keys):
    """Compact 'name xN' rendering of a metadata-column layout, in order."""
    out = []
    for k in keys:
        if out and out[-1][0] == k:
            out[-1][1] += 1
        else:
            out.append([k, 1])
    return ['%s x%d' % (k, n) if n > 1 else k for k, n in out]


def _layout_permutation(src_keys, dst_keys):
    """Indices into ``src_keys`` that rearrange it into ``dst_keys`` (same
    multiset; repeats of a key keep their relative order, matching how vector
    metadata expands one column per element on both sides)."""
    from collections import defaultdict, deque
    slots = defaultdict(deque)
    for i, k in enumerate(src_keys):
        slots[k].append(i)
    return np.array([slots[k].popleft() for k in dst_keys], np.intp)


def _load_calibration_batch(handler, calibration_dir, limit=8):
    """Real-data calibration inputs for --int8: images from ``calibration_dir``
    (center-cropped to the smallest common size, stacked) plus the per-image
    metadata vectors from its ``degradation_metadata.csv`` when the model
    consumes metadata.  Interp-input families expect the images to already be
    in the model's input form (pre-upscaled), same as the serving contract."""
    from PIL import Image
    names = sorted(f for f in os.listdir(calibration_dir)
                   if f.lower().endswith(('.png', '.jpg', '.jpeg', '.bmp')))[:limit]
    if not names:
        raise RuntimeError('no calibration images found in %s' % calibration_dir)
    imgs = [np.asarray(Image.open(os.path.join(calibration_dir, n)).convert('RGB'),
                       np.float32) / 255.0 for n in names]
    hmin = min(i.shape[0] for i in imgs)
    wmin = min(i.shape[1] for i in imgs)

    def crop(i):
        hs = (i.shape[0] - hmin) // 2
        ws = (i.shape[1] - wmin) // 2
        return i[hs:hs + hmin, ws:ws + wmin]

    x = np.stack([crop(i) for i in imgs])
    meta = None
    if handler.uses_metadata or handler.channel_concat:
        csv_path = os.path.join(calibration_dir, 'degradation_metadata.csv')
        if not os.path.isfile(csv_path):
            raise RuntimeError(
                'metadata model: the --calibration_images directory needs a '
                'degradation_metadata.csv (the data-layer contract, keyed by '
                'filename) so the int8 gates calibrate on real metadata')
        from ..data.datasets import read_augmentation_list
        try:
            aug, keys = read_augmentation_list(csv_path, filenames=names)
        except KeyError as exc:
            raise RuntimeError(
                'calibration image %s has no row in %s — the CSV must be keyed '
                'by the exact filenames in --calibration_images (the data-layer '
                'contract written by image_manipulate)' % (exc, csv_path)) from exc
        expected = list(handler.metadata_keys or [])
        # column IDENTITY must match, not just the count: the CSV yields columns
        # in file order while the serving layout is canonical (attributes first,
        # blur_kernel last) — reorder matching columns, refuse real mismatches
        if sorted(keys) != sorted(expected):
            raise RuntimeError(
                'calibration metadata columns %s do not match the model\'s '
                'serving layout %s — point --calibration_images at data '
                'prepared like the training set'
                % (_key_counts(keys), _key_counts(expected)))
        perm = _layout_permutation(keys, expected)
        meta = np.stack([np.asarray(aug[n], np.float32)[perm] for n in names])
    return x, meta


def export_handler(handler, batch_size, height, width, platforms=None,
                   input_dtype=jnp.float32, int8=False):
    """Serialize the handler's serving forward at a static shape -> bytes."""
    fn = build_int8_serving_fn(handler) if int8 else build_serving_fn(handler)
    x_spec = jax.ShapeDtypeStruct((batch_size, height, width,
                                   handler.in_channels), input_dtype)
    args = [x_spec]
    n_meta = len(handler.metadata_keys or [])
    if handler.uses_metadata or handler.channel_concat:
        if not n_meta:
            raise RuntimeError('metadata model: call set_metadata_keys before export')
        args.append(jax.ShapeDtypeStruct((batch_size, n_meta), jnp.float32))
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*args)
    return exported.serialize()


def load_exported(path):
    """Deserialize an exported artifact -> the jax.export Exported object
    (signature in ``.in_avals``/``.out_avals``, callable in ``.call``)."""
    with open(path, 'rb') as f:
        return jax_export.deserialize(bytearray(f.read()))


def load_serving(path):
    """Deserialize an exported artifact -> callable (the jax.export round-trip)."""
    return load_exported(path).call


def export_experiment(model_loc, experiment, epoch, batch_size, height, width,
                      out_path=None, platforms=None, metadata_keys=None,
                      uint8_input=False, int8=False, calibration_images=None,
                      int8_residual='bfloat16'):
    """Load an experiment (ModelInterface path, identical to eval_sisr) and export."""
    from ..models.interface import ModelInterface

    iface = ModelInterface(model_loc, experiment, mode='eval', load_epoch=epoch)
    handler = iface.model
    if handler.uses_metadata or handler.channel_concat:
        cfg, seen = [], set()
        for k in (metadata_keys
                  or (getattr(handler, 'metadata', None) or ['blur_kernel'])):
            if k not in seen:  # a pre-expanded list must not double-expand
                seen.add(k)
                cfg.append(k)
        # Dataset-side expansion (data/datasets.py:226-273): vector metadata occupy
        # one column per element; celeba attributes sit FIRST (extendleft) and
        # online-degradation blur kernels are appended LAST — the serving columns
        # reproduce the training-time layout.
        keys = ['celeba_attribute'] * 40 if 'all' in cfg else []
        for k in cfg:
            if k in ('all', 'blur_kernel'):
                continue
            keys.extend(['unmodified_blur_kernel'] * 441
                        if k == 'unmodified_blur_kernel' else [k])
        if 'blur_kernel' in cfg:
            keys.extend(['blur_kernel'] * 10)
        handler.set_metadata_keys(keys)
        expected = getattr(handler, 'num_metadata', None)
        selected = len(keys) if handler.meta_indices is None \
            else len(handler.meta_indices)
        if handler.uses_metadata and expected is not None and selected != expected:
            raise RuntimeError(
                'metadata expansion mismatch: keys %s select %d of %d serving '
                'columns but the model was built for %d (config metadata: %s) — '
                'pass --metadata with the unexpanded config key names'
                % (cfg, selected, len(keys), expected,
                   getattr(handler, 'metadata', None)))
    if handler.state is None:
        handler.init_state(spatial=(height, width))
    if int8:
        if handler.int8_family is None:
            raise RuntimeError('no int8 serving path for this architecture '
                               '(%s) — export without --int8'
                               % type(handler).__name__)
        if calibration_images is None:
            raise RuntimeError('--int8 needs --calibration_images: activation '
                               'scales are calibrated on real images, not '
                               'random data')
        handler.set_int8(True, residual_dtype=int8_residual)
        x_cal, meta_full = _load_calibration_batch(handler, calibration_images)
        x_cal = handler._int8_calibration_input(jnp.asarray(x_cal, jnp.float32))
        meta_cal = handler.prepare_metadata(x_cal, jnp.asarray(meta_full)) \
            if meta_full is not None else None
        handler._ensure_int8_ctx(x_cal, meta_cal)
    blob = export_handler(handler, batch_size, height, width, platforms=platforms,
                          input_dtype=jnp.uint8 if uint8_input else jnp.float32,
                          int8=int8)
    if out_path is None:
        out_path = '%s_%s_%dx%dx%d%s%s' % (experiment, iface.model_epoch,
                                           batch_size, height, width,
                                           '_int8' if int8 else '', FILE_SUFFIX)
    with open(out_path, 'wb') as f:
        f.write(blob)
    # sidecar manifest: everything a deployment runner needs that the StableHLO
    # signature alone cannot carry (scale, colorspace/interp input contract,
    # metadata column layout) — consumed by tools/run_serving.py
    import json
    manifest = {
        'format': 'sisr-hlo-manifest/1',
        'model': iface.name, 'experiment': experiment,
        'epoch': iface.model_epoch, 'scale': handler.scale,
        'colorspace': handler.colorspace, 'im_input': handler.im_input,
        'in_channels': handler.in_channels,
        'batch_size': batch_size, 'height': height, 'width': width,
        'input_dtype': 'uint8' if uint8_input else 'float32',
        'metadata_keys': list(handler.metadata_keys)
            if (handler.uses_metadata or handler.channel_concat) else None,
        'int8': bool(int8),
        'int8_residual': int8_residual if int8 else None,
        'platforms': list(platforms) if platforms else None,
    }
    with open(out_path + '.json', 'w') as f:
        json.dump(manifest, f, indent=1)
    return out_path


@click.command(help='Export a trained experiment as a self-contained StableHLO '
                    'serving artifact (weights + graph, loadable with jax alone).')
@click.option('--model_loc', required=True, help='Experiment parent directory.')
@click.option('--experiment', required=True, help='Experiment name.')
@click.option('--epoch', default='best', show_default=True,
              help='Checkpoint epoch (number, "best" or "last").')
@click.option('--batch_size', default=1, show_default=True)
@click.option('--height', default=128, show_default=True, help='LR input height.')
@click.option('--width', default=128, show_default=True, help='LR input width.')
@click.option('--out', default=None, help='Output path (default: derived name).')
@click.option('--platform', multiple=True,
              help='Target platform(s), e.g. tpu cpu; default: current backend.')
@click.option('--metadata', multiple=True,
              help='Metadata keys the serving input will carry (q-models; '
                   'default: the model config\'s list).')
@click.option('--uint8', 'uint8_input', is_flag=True,
              help='Take uint8 0-255 input (minimal-transport serving).')
@click.option('--int8', is_flag=True,
              help='Freeze the int8-quantized serving program (int8 conv spine, '
                   'f32 attention; ~4x smaller artifact).')
@click.option('--calibration_images', default=None,
              type=click.Path(exists=True, file_okay=False),
              help='Directory of real images (+ degradation_metadata.csv for '
                   'metadata models) to calibrate int8 activation scales on. '
                   'Required with --int8.')
@click.option('--int8_residual', default='bfloat16', show_default=True,
              type=click.Choice(['float32', 'bfloat16']),
              help='Residual-carry dtype of the int8 program.')
def export_serving_cli(model_loc, experiment, epoch, batch_size, height, width,
                       out, platform, metadata, uint8_input, int8,
                       calibration_images, int8_residual):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    if epoch not in ('best', 'last'):
        epoch = int(epoch)
    path = export_experiment(model_loc, experiment, epoch, batch_size, height,
                             width, out_path=out, platforms=list(platform) or None,
                             metadata_keys=list(metadata) or None,
                             uint8_input=uint8_input, int8=int8,
                             calibration_images=calibration_images,
                             int8_residual=int8_residual)
    size_mb = os.path.getsize(path) / 1e6
    print('exported %s (%.1f MB)' % (path, size_mb))


if __name__ == '__main__':
    export_serving_cli()
