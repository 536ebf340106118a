"""CLI contract tests: train_sisr / eval_sisr / image_manipulate through click."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

SET5 = '/root/reference/Data/example_data/Set5'
pytestmark = pytest.mark.skipif(not os.path.isdir(SET5),
                                reason='Set5 example data unavailable')


TRAIN_TOML = """
experiment = "cli_srcnn"
experiment_save_loc = "{save_loc}"

[data]
batch_size = 1
dataloader_threads = 1
[data.training_sets]
[data.training_sets.data_1]
lr = "{lr_dir}"
hr = "{hr_dir}"
degradation_metadata = "on_site"

[data.eval_sets]
[data.eval_sets.data_1]
lr = "{lr_dir}"
hr = "{hr_dir}"
cutoff = 2
degradation_metadata = "on_site"

[model]
name = "srcnn"
[model.internal_params]
scale = 4
kernel_pattern = [ 3, 3 ]
channel_pattern = [ 1, 4, 1 ]

[training]
num_epochs = 1
metrics = [ "PSNR" ]
"""


def test_train_then_eval_cli(tmp_path):
    from sisr_tpu.net_train import experiment_setup
    from sisr_tpu.net_eval import eval_run

    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    cfg = tmp_path / 'train.toml'
    cfg.write_text(TRAIN_TOML.format(save_loc=save_loc,
                                     lr_dir=os.path.join(SET5, 'lr_random_blur'),
                                     hr_dir=os.path.join(SET5, 'hr')))
    runner = CliRunner()
    result = runner.invoke(experiment_setup, ['--parameters', str(cfg)],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    exp_dir = os.path.join(save_loc, 'cli_srcnn')
    assert os.path.isfile(os.path.join(exp_dir, 'config.toml'))
    assert os.path.isfile(os.path.join(exp_dir, 'extra_metadata.csv'))
    assert os.path.isfile(os.path.join(exp_dir, 'saved_models', 'train_model_0'))
    summary = pd.read_csv(os.path.join(exp_dir, 'result_outputs', 'summary.csv'))
    assert len(summary) == 1

    # eval via CLI with a TOML config file providing defaults
    eval_cfg = tmp_path / 'eval.toml'
    eval_cfg.write_text('\n'.join([
        'hr_dir = "%s"' % os.path.join(SET5, 'hr'),
        'lr_dir = "%s"' % os.path.join(SET5, 'lr_random_blur'),
        'model_and_epoch = [ [ "cli_srcnn", "best" ] ]',
        'metrics = [ "PSNR" ]',
        'full_directory = true',
        'no_image_comparison = true',
        'results_name = "cli_eval"',
        'model_loc = "%s"' % save_loc,
        'out_loc = "%s"' % str(tmp_path),
    ]))
    result = runner.invoke(eval_run, ['--config', str(eval_cfg)],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    metrics_csv = os.path.join(str(tmp_path), 'cli_eval', 'standard_metrics',
                               'individual_metrics.csv')
    indiv = pd.read_csv(metrics_csv, header=[0, 1], index_col=0)
    assert len(indiv) == 5


def test_image_manipulate_cli(tmp_path):
    from sisr_tpu.tools.data_converter import manipulation_hub
    runner = CliRunner()
    out_dir = str(tmp_path / 'degraded')
    result = runner.invoke(manipulation_hub, [
        '--source_dir', os.path.join(SET5, 'hr'), '--output_dir', out_dir,
        '--pipeline', 'blur-downscale', '--scale', '4', '--seed', '8'],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    meta = pd.read_csv(os.path.join(out_dir, 'degradation_metadata.csv'), index_col=0)
    assert len(meta) == 5
    kernel = json.loads(meta.iloc[0]['blur_kernel'])
    assert len(kernel) == 10  # 10-d PCA code
    assert os.path.isfile(os.path.join(out_dir, 'baby.png'))
    assert os.path.isfile(os.path.join(out_dir, 'pca_matrix.pth'))
    # LR images are scale/4 of the (cropped) HR
    from PIL import Image
    hr = Image.open(os.path.join(SET5, 'hr', 'baby.png'))
    lr = Image.open(os.path.join(out_dir, 'baby.png'))
    assert lr.width == (hr.width // 4) and lr.height == (hr.height // 4)


def test_jpeg_pipeline(tmp_path):
    from sisr_tpu.tools.data_converter import manipulation_hub
    runner = CliRunner()
    out_dir = str(tmp_path / 'jpegged')
    result = runner.invoke(manipulation_hub, [
        '--source_dir', os.path.join(SET5, 'lr_random_blur'), '--output_dir', out_dir,
        '--pipeline', 'jpeg_compress', '--jpeg_quality', '40'],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    meta = pd.read_csv(os.path.join(out_dir, 'degradation_metadata.csv'), index_col=0)
    assert (meta['jpeg_quality'] == 40).all()


def test_create_h5(tmp_path):
    """create_h5 bundles a folder of same-sized images (the reference's version was
    left unusable; ref data_converter.py:52-70)."""
    import h5py
    import numpy as np
    from PIL import Image
    from sisr_tpu.tools.data_converter import create_h5
    rng = np.random.RandomState(0)
    imgs = []
    for i in range(3):
        arr = (rng.rand(16, 20, 3) * 255).astype(np.uint8)
        imgs.append(arr)
        Image.fromarray(arr).save(tmp_path / ('im%d.png' % i))
    out = create_h5(str(tmp_path), str(tmp_path / 'bundle.h5'))
    with h5py.File(out, 'r') as f:
        data = np.asarray(f['images'])
    assert data.shape == (3, 16, 20, 3)
    np.testing.assert_array_equal(data[0], imgs[0])
