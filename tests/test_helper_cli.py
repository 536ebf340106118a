"""Helper CLI coverage: clean_models, extract_best_model, model_report, images_to_video."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from sisr_tpu.tools import helper_cli


@pytest.fixture
def experiment_dir(tmp_path):
    base = tmp_path / 'exp'
    (base / 'saved_models').mkdir(parents=True)
    (base / 'result_outputs').mkdir()
    psnrs = [20.0, 25.0, 24.0, 23.0, 22.0, 21.0]
    pd.DataFrame({'epoch': range(6), 'val-PSNR': psnrs}).to_csv(
        base / 'result_outputs' / 'summary.csv', index=False)
    for i in range(6):
        (base / 'saved_models' / ('train_model_%d' % i)).write_bytes(b'ckpt%d' % i)
    (base / 'result_outputs' / 'epoch_3_samples').mkdir()
    (base / 'config.toml').write_text('x = 1\n')
    (base / 'extra_metadata.csv').write_text('model_parameters\n1\n')
    (base / 'result_outputs' / 'loss_plots.pdf').write_bytes(b'pdf')
    return base


def test_model_report(experiment_dir):
    files, best, last = helper_cli.model_report(str(experiment_dir))
    assert best == 1 and last == 5
    assert 'train_model_1' in files


def test_clean_models(experiment_dir):
    helper_cli.clean_models(str(experiment_dir), clean_samples=True)
    kept = sorted(os.listdir(experiment_dir / 'saved_models'))
    # best-1, best, best+1, last retained (ref: helper_functions.py:291-293)
    assert kept == ['train_model_0', 'train_model_1', 'train_model_2', 'train_model_5']
    assert not (experiment_dir / 'result_outputs' / 'epoch_3_samples').exists()


def test_clean_models_keep_every(experiment_dir):
    """keep_every=2 (keep-period retention) additionally keeps epochs 0/2/4."""
    helper_cli.clean_models(str(experiment_dir), keep_every=2)
    kept = sorted(os.listdir(experiment_dir / 'saved_models'))
    assert kept == ['train_model_0', 'train_model_1', 'train_model_2',
                    'train_model_4', 'train_model_5']


def test_extract_best_model(experiment_dir, tmp_path):
    out = tmp_path / 'bundles'
    out.mkdir()
    helper_cli.extract_best_model(str(experiment_dir), str(out))
    assert (out / 'exp' / 'saved_models' / 'train_model_1').exists()
    assert (out / 'exp' / 'config.toml').exists()
    assert (out / 'exp' / 'result_outputs' / 'summary.csv').exists()


def test_images_to_video(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            tmp_path / ('frame%d.png' % i))
    helper_cli.convert_image_sequence_to_movie(str(tmp_path), 'out.mp4', fps=4)
    video = tmp_path / 'out.mp4'
    assert video.exists() and video.stat().st_size > 0
