"""Fast-lane smoke coverage: one representative path per heavy subsystem whose
full suite lives in the slow lane (test_models / test_fused_families /
test_data_layer / test_quantization / test_branching...).  Everything here uses
tiny shapes and a handful of compiles so the default `pytest tests/` lane keeps
end-to-end signal while staying fast on a weak host."""
import os

import numpy as np
import pytest

from sisr_tpu.tools.e2e_bench import build_workload


def test_train_and_eval_step_smoke():
    """Jitted train step (fwd+bwd+adam+schedule) and eval step on tiny EDSR."""
    from sisr_tpu.models.handlers import define_model
    h = define_model('edsr', scale=2, num_features=8, num_blocks=1, lr=1e-3)
    rng = np.random.RandomState(0)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 16, 16, 3).astype(np.float32)}
    losses = [float(h.run_train(**batch)[0]) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[2] < losses[0]  # same batch: adam must make progress
    out, _, _ = h.run_eval(batch['lr'])
    assert out.shape == (2, 16, 16, 3) and np.isfinite(out).all()


def test_metadata_model_smoke():
    """QModel plumbing: metadata key-mask -> qrcan forward, train + fused eval."""
    from sisr_tpu.models.handlers import define_model
    h = define_model('qrcan', scale=2, n_feats=16, n_resblocks=1, n_resgroups=1,
                     style='max_concat', include_q_layer=True,
                     metadata=['blur_kernel'], lr=1e-3)
    h.set_metadata_keys(['blur_kernel'] * 10)
    rng = np.random.RandomState(1)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 16, 16, 3).astype(np.float32),
             'metadata': rng.rand(2, 10).astype(np.float32)}
    loss, _ = h.run_train(**batch)
    assert np.isfinite(float(loss))
    (keys, vals), _ = h.run_eval_fused(batch, metrics=('PSNR',))
    vals = np.asarray(vals)
    assert vals.shape == (len(keys), 2) and np.isfinite(vals).all()


def test_data_layer_smoke(tmp_path):
    """Dataset index + metadata CSV parsing + threaded loader round trip."""
    from sisr_tpu.data.datasets import SuperResImages
    from sisr_tpu.data.loader import DataLoader
    lr_dir, hr_dir = build_workload(str(tmp_path), 3, lr_size=16,
                                    metadata_cols=10)
    ds = SuperResImages(lr_dir, hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4,
                        degradation_metadata_file=os.path.join(
                            lr_dir, 'degradation_metadata.csv'),
                        metadata='all')
    assert len(ds) == 3 and len(ds.metadata_keys) == 10
    batch = next(iter(DataLoader(ds, batch_size=2, num_workers=2)))
    assert batch['lr'].shape == (2, 16, 16, 3)
    assert batch['hr'].shape == (2, 64, 64, 3)
    assert batch['metadata'].shape == (2, 10)


def test_collage_multi_image_and_one_wide(tmp_path):
    """Comparison collages across multiple images (axes are cleared and the
    unused grid cells re-hidden between images) and the 1-wide grid layout
    (matplotlib returns a 1-D axes array there — tuple indexing would crash)."""
    from collections import OrderedDict
    from sisr_tpu.tools.visualization import interpret_sisr_images
    rng = np.random.RandomState(0)
    pkg = OrderedDict([('HR', rng.rand(2, 16, 16, 3)),
                       ('LR', rng.rand(2, 16, 16, 3)),
                       ('exp', rng.rand(2, 16, 16, 3))])
    interpret_sisr_images(pkg, {'exp>PSNR': [30.0, 31.0]}, ['PSNR'],
                          str(tmp_path), names=['a.pdf', 'b.pdf'], config='rgb')
    interpret_sisr_images(pkg, {}, [], str(tmp_path), names=['c.pdf', 'd.pdf'],
                          config='rgb', images_per_row=1)
    for n in ('a.pdf', 'b.pdf', 'c.pdf', 'd.pdf'):
        assert os.path.getsize(os.path.join(str(tmp_path), n)) > 0


def test_int8_conv_smoke():
    """int8 conv matches the f32 conv within quantization tolerance."""
    import jax.numpy as jnp
    from jax import lax
    from sisr_tpu.ops.quantization import conv_int8, quantize_kernel_int8
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    ref = lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                   dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    qk, s = quantize_kernel_int8(k)
    out = conv_int8(x, qk, s)
    assert float(jnp.abs(out - ref).max()) < 0.05
