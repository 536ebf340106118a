"""Orbax directory-checkpoint backend (opt-in alternative to the msgpack files).

The default checkpoint format is the reference's single-file contract
(``saved_models/train_model_<N>`` msgpack — ref: Code/SISR/models/__init__.py:349-380).
Setting ``checkpoint_backend = "orbax"`` in ``[model.internal_params]`` switches
saving to orbax directory checkpoints at the same paths (``train_model_<N>/``):
atomic directory commits, per-array files (zarr) that large multi-host deployments
can write in parallel, and forward compatibility with orbax retention tooling.
Loading auto-detects either format, so experiments can mix backends across epochs.

Array trees go through ``PyTreeCheckpointer``; the non-array metadata
(model name / epoch / step) travels in a small JSON sidecar inside the directory.
"""
import json
import os

import numpy as np


_META_NAME = 'handler_meta.json'
_TREE_NAME = 'tree'


def save_orbax(path, state_dict):
    """Write a handler state dict (see BaseHandler.save_model) as an orbax dir.

    The whole checkpoint (tree + meta sidecar) is staged in a temp directory and
    atomically renamed into place: a crash mid-save must never leave a directory
    that load_model auto-detects as an orbax checkpoint but cannot restore."""
    import shutil
    import orbax.checkpoint as ocp

    state_dict = dict(state_dict)
    meta = {'model_name': state_dict.pop('model_name'),
            'model_epoch': int(state_dict.pop('model_epoch')),
            'step': int(np.asarray(state_dict.pop('step')))}
    path = os.path.abspath(path)
    # dot-prefixed staging sibling: a crash-leftover must never match the
    # 'train_model_*' globs that clean_models / epoch resolution scan
    head, base = os.path.split(path)
    from .async_ckpt import sweep_stale_tmp
    sweep_stale_tmp(head, base)  # reclaim orphaned staging dirs of dead writers
    staging = os.path.join(head, '.tmp-%d-%s' % (os.getpid(), base))
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(staging, _TREE_NAME), state_dict, force=True)
    with open(os.path.join(staging, _META_NAME), 'w') as f:
        json.dump(meta, f)
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.isfile(path):  # overwriting an epoch saved as msgpack
        os.remove(path)
    os.rename(staging, path)


def restore_orbax(path):
    """Restore a state dict written by :func:`save_orbax`.

    Arrays are restored as HOST numpy, which makes checkpoints topology-portable
    by construction: a run saved from an 8-device mesh restores on 1 device (and
    vice versa) with no sharding metadata involved — the caller re-places the tree
    for the current mesh (load_model device_puts / MeshContext.replicate).
    Restoring without explicit types would instead read the saved per-array
    sharding file and warn that it is unsafe on a different topology."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    tree_path = os.path.join(path, _TREE_NAME)
    meta_tree = ckpt.metadata(tree_path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
    state_dict = ckpt.restore(tree_path, restore_args=restore_args)
    with open(os.path.join(path, _META_NAME)) as f:
        meta = json.load(f)
    state_dict = dict(state_dict)
    state_dict['model_name'] = meta['model_name']
    state_dict['model_epoch'] = meta['model_epoch']
    state_dict['step'] = np.asarray(meta['step'])
    return state_dict
