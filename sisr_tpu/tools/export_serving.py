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


def export_handler(handler, batch_size, height, width, platforms=None,
                   input_dtype=jnp.float32):
    """Serialize the handler's serving forward at a static shape -> bytes."""
    fn = build_serving_fn(handler)
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


def load_serving(path):
    """Deserialize an exported artifact -> callable (the jax.export round-trip)."""
    with open(path, 'rb') as f:
        return jax_export.deserialize(bytearray(f.read())).call


def export_experiment(model_loc, experiment, epoch, batch_size, height, width,
                      out_path=None, platforms=None, metadata_keys=None,
                      uint8_input=False):
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
    blob = export_handler(handler, batch_size, height, width, platforms=platforms,
                          input_dtype=jnp.uint8 if uint8_input else jnp.float32)
    if out_path is None:
        out_path = '%s_%s_%dx%dx%d%s' % (experiment, iface.model_epoch, batch_size,
                                         height, width, FILE_SUFFIX)
    with open(out_path, 'wb') as f:
        f.write(blob)
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
def export_serving_cli(model_loc, experiment, epoch, batch_size, height, width,
                       out, platform, metadata, uint8_input):
    if epoch not in ('best', 'last'):
        epoch = int(epoch)
    path = export_experiment(model_loc, experiment, epoch, batch_size, height,
                             width, out_path=out, platforms=list(platform) or None,
                             metadata_keys=list(metadata) or None,
                             uint8_input=uint8_input)
    size_mb = os.path.getsize(path) / 1e6
    print('exported %s (%.1f MB)' % (path, size_mb))


if __name__ == '__main__':
    export_serving_cli()
