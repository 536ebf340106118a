"""Every shipped sample config must build a real handler.

The reference ships 18 sample training configs (Documentation/sample_config_files/
{div2k,celebahq,div2k_compressed}); configs/ mirrors that matrix in the identical
TOML schema.  This smoke test drives each file through the same path the product
uses (net_train.py:39-44 -> ModelInterface -> define_model, interface.py:64-75):
parse, None-default, construct the handler from ``internal_params`` verbatim, and
resolve the metadata mask against the dataset-side metadata keys.
"""
import glob
import os

import pytest

from sisr_tpu.models.handlers import available_models, define_model
from sisr_tpu.utils import toml_io

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), '..', 'configs')
TRAIN_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_ROOT, '*', '*.toml'))
    if os.path.basename(os.path.dirname(p)) != 'eval')


def _dataset_meta_keys(data_section):
    """Expand the data section's metadata list the way SuperResImages does
    (data/datasets.py:270-273: 'blur_kernel' covers the full PCA-kernel width)."""
    keys = []
    for k in data_section.get('metadata') or []:
        keys.extend(['blur_kernel'] * 10 if k == 'blur_kernel' else [k])
    return keys


@pytest.mark.parametrize('path', TRAIN_CONFIGS,
                         ids=[os.path.relpath(p, CONFIG_ROOT) for p in TRAIN_CONFIGS])
def test_sample_config_builds_handler(path):
    params = toml_io.convert_default_none_dict(toml_io.load(path))

    assert params['experiment'], path
    assert params['data']['batch_size'] >= 1
    assert params['training']['gpu'] in ('single', 'multi', 'off')
    # an epoch budget must exist one way or the other
    assert (params['training'].get('num_epochs') is not None
            or params['training'].get('epoch_cutoff') is not None)

    name = params['model']['name']
    assert name in available_models, '%s: unknown model %r' % (path, name)

    internal = dict(params['model'].get('internal_params') or {})
    internal.pop('metadata_list', None)  # legacy key, dropped by ModelInterface
    handler = define_model(name=name, eval_mode=False, **internal)

    # optimizer/scheduler built from the config values
    assert handler.tx is not None
    assert handler.schedule(0) > 0

    # metadata selection resolves against the training set's key list
    train_sets = params['data']['training_sets']
    first = train_sets[sorted(train_sets)[0]]
    handler.set_metadata_keys(_dataset_meta_keys(first))
    if handler.uses_metadata:
        assert handler.num_metadata >= 1


def test_config_matrix_matches_reference():
    """The shipped matrix covers every model the reference's sample set does."""
    by_dir = {}
    for p in TRAIN_CONFIGS:
        d = os.path.basename(os.path.dirname(p))
        cfg = toml_io.load(p)
        by_dir.setdefault(d, set()).add(cfg['model']['name'])
    assert {'edsr', 'rcan', 'han', 'san', 'srmd', 'sftmd',
            'qedsr', 'qhan', 'qsan', 'qrcan'} <= by_dir['div2k']
    assert {'rcan', 'sparnet', 'qrcan', 'qsparnet'} <= by_dir['celebahq']
    assert by_dir['div2k_compressed'] == {'qrcan', 'rcan'}
