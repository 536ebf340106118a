"""REAL multi-process launch: 2 processes x 4 virtual CPU devices each, localhost
coordinator via the SISR_TPU_* launcher contract (parallel/distributed.py).

Covers the branch a real pod takes — ``jax.distributed.initialize`` +
``make_multihost_mesh`` with ``process_count()==2`` (the hybrid-mesh path,
parallel/mesh.py) — which single-process tests and the driver dryrun exercise only
via the reshape fallback.  Asserts: (a) both ranks see the 8-device world, (b) only
rank 0 writes checkpoints/CSVs, (c) the training trajectory is bit-comparable to a
single-process 8-device DP run on the same data.
"""
import os
import shutil
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SET5 = '/root/reference/Data/example_data/Set5'
pytestmark = [pytest.mark.skipif(not os.path.isdir(SET5),
                                 reason='Set5 example data unavailable'),
              pytest.mark.slow]

WRAPPER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)
from sisr_tpu.parallel.distributed import maybe_init_distributed
assert maybe_init_distributed() == %(multi)s
from sisr_tpu.net_train import experiment_setup
print('WORLD process_id=%%d process_count=%%d n_devices=%%d'
      %% (jax.process_index(), jax.process_count(), len(jax.devices())))
try:
    experiment_setup(args=['--parameters', %(cfg)r, '--gpu', 'multi'],
                     standalone_mode=False)
except SystemExit as e:
    if e.code not in (0, None):
        raise
import sisr_tpu.data.loader as _loader
print('ITEMS_LOADED %%d rank=%%d' %% (_loader.ITEMS_LOADED, jax.process_index()))
print('RANK_DONE %%d' %% jax.process_index())
"""

TRAIN_TOML = """
experiment = "mp_edsr"
experiment_save_loc = "{save_loc}"
[data]
batch_size = 8
dataloader_threads = 1
[data.training_sets.data_1]
lr = "{lr_dir}"
hr = "{hr_dir}"
crop = 16
[data.eval_sets.data_1]
lr = "{lr_dir}"
hr = "{hr_dir}"
cutoff = 2
[model]
name = "edsr"
[model.internal_params]
scale = 4
num_features = 8
num_blocks = 1
[training]
num_epochs = 1
metrics = [ "PSNR" ]
"""


def _build_data(tmp_path, n=16):
    """16-image dataset (Set5 tiled) so global batches divide the 8-device mesh.

    Images are pre-cropped to exactly 16x16 LR / 64x64 HR: the config's crop=16
    then has zero freedom (randint(0,0)), so per-item augmentation RNG — which is
    rank-local under multihost input sharding — cannot perturb the trajectory
    comparison against the single-process run."""
    lr_dir = str(tmp_path / 'lr')
    hr_dir = str(tmp_path / 'hr')
    os.makedirs(lr_dir)
    os.makedirs(hr_dir)
    names = sorted(f for f in os.listdir(os.path.join(SET5, 'hr')))
    for i in range(n):
        src = names[i % len(names)]
        # re-encode so every file is a self-contained PNG with a unique name
        Image.open(os.path.join(SET5, 'lr_random_blur', src)).crop(
            (0, 0, 16, 16)).save(os.path.join(lr_dir, 'im%02d.png' % i))
        Image.open(os.path.join(SET5, 'hr', src)).crop(
            (0, 0, 64, 64)).save(os.path.join(hr_dir, 'im%02d.png' % i))
    return lr_dir, hr_dir


def _write_cfg(tmp_path, tag, lr_dir, hr_dir):
    save_loc = str(tmp_path / ('results_%s' % tag))
    os.makedirs(save_loc)
    cfg = str(tmp_path / ('train_%s.toml' % tag))
    with open(cfg, 'w') as f:
        f.write(TRAIN_TOML.format(save_loc=save_loc, lr_dir=lr_dir, hr_dir=hr_dir))
    return cfg, save_loc


def _launch(cfg, multi, extra_env, tmp_path, tag):
    script = str(tmp_path / ('wrap_%s.py' % tag))
    with open(script, 'w') as f:
        f.write(WRAPPER % {'repo': REPO, 'cfg': cfg, 'multi': multi})
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('SISR_TPU_', 'XLA_FLAGS', 'JAX_PLATFORMS'))}
    env.update(extra_env)
    return subprocess.Popen([sys.executable, script], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process(tmp_path):
    lr_dir, hr_dir = _build_data(tmp_path)

    # --- run A: ONE process, 8 virtual devices (flat DP mesh, the comparison run)
    cfg_a8, loc_a8 = _write_cfg(tmp_path, 'single8', lr_dir, hr_dir)
    script = str(tmp_path / 'wrap_single8.py')
    with open(script, 'w') as f:
        f.write((WRAPPER % {'repo': REPO, 'cfg': cfg_a8, 'multi': False})
                .replace("'jax_num_cpu_devices', 4", "'jax_num_cpu_devices', 8"))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('SISR_TPU_', 'XLA_FLAGS', 'JAX_PLATFORMS'))}
    p8 = subprocess.Popen([sys.executable, script], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)
    out_a8, _ = p8.communicate(timeout=900)
    assert 'RANK_DONE 0' in out_a8, out_a8
    assert 'n_devices=8' in out_a8, out_a8

    # --- run B: TWO processes x 4 devices, localhost coordinator
    cfg_b, loc_b0 = _write_cfg(tmp_path, 'multi', lr_dir, hr_dir)
    port = _free_port()
    procs = []
    for rank in range(2):
        procs.append(_launch(cfg_b, True, {
            'SISR_TPU_COORDINATOR': 'localhost:%d' % port,
            'SISR_TPU_NUM_PROCESSES': '2',
            'SISR_TPU_PROCESS_ID': str(rank),
        }, tmp_path, 'multi_r%d' % rank))
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, 'rank %d failed:\n%s' % (rank, out)

    # (a) both ranks joined the 8-device world through the distributed runtime
    assert 'process_id=0 process_count=2 n_devices=8' in outs[0], outs[0]
    assert 'process_id=1 process_count=2 n_devices=8' in outs[1], outs[1]
    assert 'RANK_DONE 0' in outs[0] and 'RANK_DONE 1' in outs[1]

    # (b) only rank 0 wrote checkpoints/CSVs (both ranks shared save_loc; the
    # writes are rank-gated, so exactly one of each artifact exists)
    exp = os.path.join(loc_b0, 'mp_edsr')
    assert os.path.isfile(os.path.join(exp, 'config.toml'))
    assert os.path.isfile(os.path.join(exp, 'saved_models', 'train_model_0'))
    summary_b = pd.read_csv(os.path.join(exp, 'result_outputs', 'summary.csv'))
    assert len(summary_b) == 1
    # rank 1's log shows it ran the same loop without owning the writes
    assert 'will start training' in outs[1] or 'Handler for experiment' in outs[1]

    # (b2) multihost input sharding: each rank's loader decoded ONLY its half of
    # the 16 training items (+ the replicated 2-image val set) — 8 + 2 = 10 —
    # while the single-process run decoded all 16 + 2 = 18
    import re
    counts = {int(m.group(2)): int(m.group(1))
              for out in outs
              for m in [re.search(r'ITEMS_LOADED (\d+) rank=(\d+)', out)] if m}
    assert counts == {0: 10, 1: 10}, counts
    m = re.search(r'ITEMS_LOADED (\d+) rank=0', out_a8)
    assert m and int(m.group(1)) == 18, out_a8

    # (c) trajectory parity: 2x4-process run == 1x8-device DP run
    summary_a = pd.read_csv(os.path.join(loc_a8, 'mp_edsr', 'result_outputs',
                                         'summary.csv'))
    for col in summary_a.columns:
        if summary_a[col].dtype.kind == 'f':
            np.testing.assert_allclose(summary_b[col].values,
                                       summary_a[col].values, rtol=1e-5,
                                       err_msg='column %s diverged' % col)
