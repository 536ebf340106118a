"""Perceptual (VGG54) loss path: converter + L1(pixel) + lambda*L1(features)
composition asserted against the torch composition (ref: sr_tools/
loss_functions.py:6-22, feature_extractors/VGGNets.py:118-131), using a synthetic
torchvision-format vgg19 state_dict — no pretrained download needed.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
        512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']


def _build_torch_vgg54():
    """torchvision vgg19 ``features[:35]`` layout (conv5_4 pre-activation)."""
    from torch import nn
    layers = []
    in_ch = 3
    for v in _CFG:
        if v == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers[:35])


@pytest.fixture(scope='module')
def vgg_fixture(tmp_path_factory):
    """(torch vgg54 trunk, saved torchvision-format state_dict path)."""
    torch.manual_seed(21)
    trunk = _build_torch_vgg54()
    # re-key to torchvision's 'features.N.{weight,bias}' naming
    sd = {'features.%s' % k: v for k, v in trunk.state_dict().items()}
    path = str(tmp_path_factory.mktemp('vgg') / 'vgg19.pth')
    torch.save(sd, path)
    return trunk, path


def test_vgg_extractor_matches_torch(vgg_fixture):
    trunk, path = vgg_fixture
    from sisr_tpu.models.feature_extractors import load_vgg_extractor
    apply_fn = load_vgg_extractor(path)
    assert apply_fn is not None
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    with torch.no_grad():
        want = trunk((torch.from_numpy(x.transpose(0, 3, 1, 2))
                      - torch.from_numpy(mean)) / torch.from_numpy(std))
    got = np.asarray(apply_fn(x)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), atol=2e-3)


def test_perceptual_loss_composition(vgg_fixture):
    """build_loss(perceptual=lambda) == lambda_pixel*L1 + lambda*L1(VGG54 feats),
    matching PerceptualMechanism's forward exactly."""
    trunk, path = vgg_fixture
    from sisr_tpu.models.feature_extractors import load_vgg_extractor
    from sisr_tpu.training.losses import build_loss
    lam = 0.01
    loss_fn = build_loss('l1', perceptual=lam, vgg_apply=load_vgg_extractor(path))
    rng = np.random.RandomState(1)
    pred = rng.rand(1, 32, 32, 3).astype(np.float32)
    target = rng.rand(1, 32, 32, 3).astype(np.float32)

    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    to_t = lambda a: ((torch.from_numpy(a.transpose(0, 3, 1, 2))
                       - torch.from_numpy(mean)) / torch.from_numpy(std))
    with torch.no_grad():
        f_pred = trunk(to_t(pred))
        f_target = trunk(to_t(target))
        want = (torch.nn.functional.l1_loss(torch.from_numpy(pred),
                                            torch.from_numpy(target))
                + lam * torch.nn.functional.l1_loss(f_pred, f_target))
    got = float(np.asarray(loss_fn(pred, target)))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_train_with_perceptual_loss(vgg_fixture):
    """3 training steps with the perceptual criterion through the real handler:
    first-step loss equals the composition on the init params, and training moves."""
    trunk, path = vgg_fixture
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.models.feature_extractors import load_vgg_extractor
    from sisr_tpu.training.losses import build_loss
    import jax

    h = define_model('edsr', eval_mode=False, scale=2, num_features=8, num_blocks=1,
                     perceptual=0.01, vgg_weights=path)
    rng = np.random.RandomState(2)
    lr = rng.rand(2, 16, 16, 3).astype(np.float32)
    hr = rng.rand(2, 32, 32, 3).astype(np.float32)
    h.init_state(spatial=(16, 16), batch=2)
    init_params = jax.tree.map(np.asarray, h.state.params)

    loss0, _ = h.run_train(lr=lr, hr=hr)
    # manual composition on the same init params
    out = np.asarray(h.module.apply({'params': init_params}, lr))
    manual = float(np.asarray(build_loss('l1', 0.01,
                                        load_vgg_extractor(path))(out, hr)))
    np.testing.assert_allclose(float(np.asarray(loss0)), manual, rtol=1e-5)

    losses = [float(np.asarray(loss0))]
    for _ in range(2):
        li, _ = h.run_train(lr=lr, hr=hr)
        losses.append(float(np.asarray(li)))
    assert losses[-1] < losses[0]  # the perceptual objective is actually optimized

    # eval-mode handlers skip the perceptual mechanism (ref training_setup gating,
    # models/__init__.py:334-342) — no VGG weights needed to evaluate
    he = define_model('edsr', eval_mode=True, scale=2, num_features=8, num_blocks=1,
                      perceptual=0.01, vgg_weights='/nonexistent.pth')
    out, _, _ = he.run_eval(lr)
    assert np.isfinite(out).all()
