"""Multi-family eval integration: QRCAN (vector metadata), SRMD (channel concat) and
SFTMD (spatial metadata) evaluated side-by-side through one EvalHub run on Set5 —
exercises the QModel metadata flow end-to-end through the eval pipeline."""
import os

import numpy as np
import pandas as pd
import pytest

SET5 = '/root/reference/Data/example_data/Set5'
pytestmark = [pytest.mark.skipif(not os.path.isdir(SET5),
                                reason='Set5 example data unavailable'),
              pytest.mark.slow]


def _make_experiment(save_loc, name, model_name, internal):
    """Create a minimal trained-looking experiment (random init, epoch 0)."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.utils import toml_io
    from sisr_tpu.utils.helpers import create_dir_if_empty
    base = os.path.join(save_loc, name)
    create_dir_if_empty(base, os.path.join(base, 'saved_models'),
                        os.path.join(base, 'result_outputs'))
    with open(os.path.join(base, 'config.toml'), 'w') as f:
        toml_io.dump({'model': {'name': model_name, 'internal_params': internal}}, f)
    handler = define_model(model_name, eval_mode=False,
                           **{k: v for k, v in internal.items()})
    if handler.uses_metadata:
        handler.set_metadata_keys(['blur_kernel'] * 10)
    handler.init_state()
    handler.save_model('train_model', 0, os.path.join(base, 'saved_models'))
    return base


def test_multi_family_eval(tmp_path):
    from sisr_tpu.evaluation.standard_eval import EvalHub
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)

    _make_experiment(save_loc, 'q_rcan_exp', 'qrcan',
                     {'scale': 4, 'n_feats': 16, 'n_resblocks': 1, 'n_resgroups': 1,
                      'style': 'max_concat', 'include_q_layer': True,
                      'metadata': ['blur_kernel']})
    _make_experiment(save_loc, 'srmd_exp', 'srmd',
                     {'scale': 4, 'nc': 16, 'nb': 4, 'metadata': ['blur_kernel']})
    _make_experiment(save_loc, 'sftmd_exp', 'sftmd',
                     {'scale': 4, 'num_features': 16, 'num_blocks': 1,
                      'metadata': ['blur_kernel']})

    out_loc = str(tmp_path / 'out')
    os.makedirs(out_loc)
    hub = EvalHub(
        hr_dir=os.path.join(SET5, 'hr'), lr_dir=os.path.join(SET5, 'lr_random_blur'),
        model_and_epoch=[('q_rcan_exp', '0'), ('srmd_exp', '0'), ('sftmd_exp', '0')],
        results_name='families', gpu=False, metrics=['PSNR'], data_split='all',
        save_im=False, batch_size=1, full_directory=True, lr_dir_interp=None,
        model_only=False, scale=4, model_loc=save_loc, out_loc=out_loc,
        use_test_group=False, no_image_comparison=True, num_image_save=0,
        qpi_selection=(None, None), data_attributes=None, dataset_name=None,
        image_shortlist=None, metadata_file=None, sp_gpu=0, time_models=False,
        recursive=False)
    hub.full_image_protocol()

    indiv = pd.read_csv(os.path.join(out_loc, 'families', 'standard_metrics',
                                     'individual_metrics.csv'), header=[0, 1],
                        index_col=0)
    assert len(indiv) == 5
    models = {c[0] for c in indiv.columns}
    assert {'q_rcan_exp', 'srmd_exp', 'sftmd_exp', 'LR'} <= models
    # random-init models produce valid (finite) PSNR values
    for m in ['q_rcan_exp', 'srmd_exp', 'sftmd_exp']:
        assert np.isfinite(indiv[(m, 'PSNR')]).all()


def test_direct_model_protocol(tmp_path):
    """model_only path: SR images saved, no metrics computed."""
    from sisr_tpu.evaluation.standard_eval import EvalHub
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    _make_experiment(save_loc, 'direct_exp', 'edsr',
                     {'scale': 4, 'num_features': 8, 'num_blocks': 1})
    out_loc = str(tmp_path / 'out')
    os.makedirs(out_loc)
    hub = EvalHub(
        hr_dir=os.path.join(SET5, 'hr'), lr_dir=os.path.join(SET5, 'lr_random_blur'),
        model_and_epoch=[('direct_exp', '0')], results_name='direct', gpu=False,
        metrics=None, data_split='all', save_im=False, batch_size=1,
        full_directory=True, lr_dir_interp=None, model_only=True, scale=4,
        model_loc=save_loc, out_loc=out_loc, use_test_group=False,
        no_image_comparison=True, num_image_save=0, qpi_selection=(None, None),
        data_attributes=None, dataset_name=None, image_shortlist=None,
        metadata_file=None, sp_gpu=0, time_models=False, recursive=False)
    hub.direct_model_protocol()
    out_imgs = sorted(os.listdir(os.path.join(out_loc, 'direct', 'direct_exp')))
    assert out_imgs == ['baby.png', 'bird.png', 'butterfly.png', 'head.png', 'woman.png']
    from PIL import Image
    im = Image.open(os.path.join(out_loc, 'direct', 'direct_exp', 'bird.png'))
    assert im.size == (288, 288)  # 72 * 4
