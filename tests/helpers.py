"""Shared test utilities."""
import os

SET5 = '/root/reference/Data/example_data/Set5'


def train_tiny_experiment(tmp_path, name, model='edsr',
                          internal=('scale = 4', 'num_features = 8',
                                    'num_blocks = 1')):
    """Train a 1-epoch tiny model on Set5 through the REAL train CLI; returns the
    experiment save_loc (several CLI tests need a trained experiment to evaluate)."""
    from click.testing import CliRunner
    from sisr_tpu.net_train import experiment_setup
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    cfg = tmp_path / 'train.toml'
    cfg.write_text('\n'.join([
        'experiment = "%s"' % name,
        'experiment_save_loc = "%s"' % save_loc,
        '[data]', 'batch_size = 1', 'dataloader_threads = 2',
        '[data.training_sets.data_1]',
        'lr = "%s"' % os.path.join(SET5, 'lr_random_blur'),
        'hr = "%s"' % os.path.join(SET5, 'hr'),
        'degradation_metadata = "on_site"', 'crop = 8',
        '[data.eval_sets.data_1]',
        'lr = "%s"' % os.path.join(SET5, 'lr_random_blur'),
        'hr = "%s"' % os.path.join(SET5, 'hr'),
        'cutoff = 5', 'degradation_metadata = "on_site"',
        '[model]', 'name = "%s"' % model,
        '[model.internal_params]', *internal,
        '[training]', 'num_epochs = 1', 'metrics = [ "PSNR" ]',
    ]))
    runner = CliRunner()
    result = runner.invoke(experiment_setup, ['--parameters', str(cfg)],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return save_loc
