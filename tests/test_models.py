import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.models.basic import SRCNN, VDSR
from sisr_tpu.models.advanced import EDSR, RCAN, HAN, SRMD
from sisr_tpu.models.san import SAN, covariance_pool, newton_schulz_sqrt
from sisr_tpu.models.qmodels import QRCAN, QEDSR, QSAN, QHAN
from sisr_tpu.models.sftmd import SFTMD
from sisr_tpu.models.sparnet import SPARNet

pytestmark = pytest.mark.slow


KEY = jax.random.PRNGKey(0)


def _init_and_apply(model, x, metadata=None, **apply_kwargs):
    kwargs = {} if metadata is None else {'metadata': metadata}
    variables = model.init(KEY, x, **kwargs, **apply_kwargs)
    out = model.apply(variables, x, **kwargs, **apply_kwargs)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables['params']))
    return out, n_params


def test_srcnn_vdsr_shapes():
    x = jnp.zeros((2, 24, 20, 1))
    out, n = _init_and_apply(SRCNN(), x)
    assert out.shape == (2, 24, 20, 1)
    # reference param count: 9x9x1x64+64 + 5x5x64x32+32 + 5x5x32x1+1 = 57281
    assert n == 57281
    out, n_vdsr = _init_and_apply(VDSR(), x)
    assert out.shape == (2, 24, 20, 1)
    # 20 x conv3x3: 1->64, 64->64 x18, 64->1
    expected = (9 * 64 + 64) + 18 * (9 * 64 * 64 + 64) + (9 * 64 + 1)
    assert n_vdsr == expected


def test_edsr_shape_and_params():
    x = jnp.zeros((1, 12, 10, 3))
    out, n = _init_and_apply(EDSR(net_features=16, num_blocks=2, scale=4), x)
    assert out.shape == (1, 48, 40, 3)
    # head + 2 blocks(2 convs) + body_tail + 2 upsampler convs + tail
    expected = (9*3*16+16) + 2*2*(9*16*16+16) + (9*16*16+16) + 2*(9*16*64+64) + (9*16*3+3)
    assert n == expected


def test_rcan_shape():
    x = jnp.zeros((1, 10, 8, 3))
    out, _ = _init_and_apply(RCAN(n_resblocks=2, n_resgroups=2, n_feats=16, scale=2), x)
    assert out.shape == (1, 20, 16, 3)


def test_han_shape():
    x = jnp.zeros((1, 10, 8, 3))
    out, _ = _init_and_apply(HAN(n_resgroups=2, n_resblocks=2, n_feats=16, scale=2), x)
    assert out.shape == (1, 20, 16, 3)


def test_srmd_shape():
    x = jnp.zeros((1, 10, 8, 18))
    out, _ = _init_and_apply(SRMD(in_nc=18, nc=32, nb=4, scale=4), x)
    assert out.shape == (1, 40, 32, 3)


def test_san_shape():
    x = jnp.zeros((1, 12, 12, 3))
    out, _ = _init_and_apply(SAN(n_resgroups=2, n_resblocks=2, n_feats=16, scale=2), x)
    assert out.shape == (1, 24, 24, 3)


def test_newton_schulz_sqrt():
    rng = np.random.RandomState(0)
    a = rng.randn(2, 8, 8).astype(np.float32)
    spd = np.einsum('bij,bkj->bik', a, a) + 0.1 * np.eye(8)
    root = np.asarray(newton_schulz_sqrt(jnp.asarray(spd)))
    recon = np.einsum('bij,bjk->bik', root, root)
    rel = np.linalg.norm(recon - spd) / np.linalg.norm(spd)
    assert rel < 0.05


def test_covariance_pool_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 6, 5, 4).astype(np.float32)
    cov = np.asarray(covariance_pool(jnp.asarray(x)))
    flat = x.reshape(2, 30, 4)
    for b in range(2):
        expected = np.cov(flat[b].T, bias=True)
        np.testing.assert_allclose(cov[b], expected, atol=1e-5)


@pytest.mark.parametrize('style', ['modulate', 'mini_concat', 'max_concat', 'softmax',
                                   'extended_attention', 'standard'])
def test_qrcan_styles(style):
    x = jnp.zeros((2, 8, 8, 3))
    # 'modulate' multiplies the attention vector elementwise: the handler's scale_qpi
    # expands scalar metadata to an n_feats gaussian profile first (handlers.py:46-54)
    meta = jnp.ones((2, 16)) if style == 'modulate' else jnp.ones((2, 10))
    model = QRCAN(n_resblocks=1, n_resgroups=1, n_feats=16, scale=2, style=style,
                  num_metadata=10, include_q_layer=style != 'modulate')
    out, _ = _init_and_apply(model, x, metadata=meta)
    assert out.shape == (2, 16, 16, 3)


def test_qrcan_selective_blocks_changes_params():
    x = jnp.zeros((1, 8, 8, 3))
    meta = jnp.ones((1, 10))
    full = QRCAN(n_resblocks=1, n_resgroups=2, n_feats=16, scale=2, num_metadata=10,
                 style='max_concat', include_q_layer=True)
    sel = QRCAN(n_resblocks=1, n_resgroups=2, n_feats=16, scale=2, num_metadata=10,
                style='max_concat', include_q_layer=True,
                selective_meta_blocks=[True, False])
    _, n_full = _init_and_apply(full, x, metadata=meta)
    _, n_sel = _init_and_apply(sel, x, metadata=meta)
    assert n_sel < n_full


def test_qedsr_qsan_qhan_shapes():
    meta = jnp.ones((1, 10))
    x = jnp.zeros((1, 8, 8, 3))
    out, _ = _init_and_apply(QEDSR(num_features=16, num_blocks=1, scale=2, input_para=10),
                             x, metadata=meta)
    assert out.shape == (1, 16, 16, 3)
    x = jnp.zeros((1, 12, 12, 3))
    out, _ = _init_and_apply(QSAN(n_resgroups=1, n_resblocks=1, n_feats=16, scale=2,
                                  input_para=10), x, metadata=meta)
    assert out.shape == (1, 24, 24, 3)
    x = jnp.zeros((1, 8, 8, 3))
    out, _ = _init_and_apply(QHAN(n_resgroups=2, n_resblocks=1, n_feats=16, scale=2,
                                  num_metadata=10), x, metadata=meta)
    assert out.shape == (1, 16, 16, 3)


@pytest.mark.parametrize('sft_type', ['standard', 'concat', 'weak', 'none'])
def test_sftmd_types(sft_type):
    x = jnp.zeros((1, 8, 8, 3))
    # 'weak' multiplies features by the metadata map directly, so it needs para
    # broadcastable against nf (scalar metadata, e.g. QPI) — same constraint as the ref
    para = 1 if sft_type == 'weak' else 10
    meta = jnp.ones((1, 8, 8, para))  # (B, H, W, M)
    model = SFTMD(num_features=16, num_blocks=1, scale=4, input_para=para,
                  sft_type=sft_type)
    out, _ = _init_and_apply(model, x, metadata=meta)
    assert out.shape == (1, 32, 32, 3)
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= 0.0


def test_sftmd_q_injection_vector_metadata():
    x = jnp.zeros((1, 8, 8, 3))
    meta = jnp.ones((1, 10))
    model = SFTMD(num_features=16, num_blocks=1, scale=4, input_para=10, q_injection=True)
    out, _ = _init_and_apply(model, x, metadata=meta)
    assert out.shape == (1, 32, 32, 3)


def test_sparnet_and_qsparnet():
    x = jnp.zeros((1, 64, 64, 3))
    model = SPARNet(in_size=64, out_size=64, res_depth=2, min_feat_size=16)
    variables = model.init(KEY, x, train=True)
    assert 'batch_stats' in variables  # default norm is BatchNorm
    out, _ = model.apply(variables, x, train=True, mutable=['batch_stats'])
    assert out.shape == (1, 64, 64, 3)

    meta = jnp.ones((1, 5))
    qmodel = SPARNet(in_size=64, out_size=64, res_depth=2, min_feat_size=16,
                     metadata_count=5)
    variables = qmodel.init(KEY, x, metadata=meta, train=True)
    out, _ = qmodel.apply(variables, x, metadata=meta, train=True, mutable=['batch_stats'])
    assert out.shape == (1, 64, 64, 3)


def test_gradients_flow_through_qrcan():
    """End-to-end grad through meta-attention (incl. SOCA-free path) is finite."""
    model = QRCAN(n_resblocks=1, n_resgroups=1, n_feats=16, scale=2, num_metadata=10,
                  style='max_concat', include_q_layer=True)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    meta = jnp.ones((1, 10)) * 0.3
    variables = model.init(KEY, x, metadata=meta)

    def loss_fn(params):
        out = model.apply({'params': params}, x, metadata=meta)
        return jnp.abs(out - 0.5).mean()

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_gradients_flow_through_san():
    """Newton-Schulz + non-local must be differentiable and finite."""
    model = SAN(n_resgroups=1, n_resblocks=1, n_feats=16, scale=2)
    x = jax.random.uniform(KEY, (1, 12, 12, 3))
    variables = model.init(KEY, x)

    def loss_fn(params):
        out = model.apply({'params': params}, x)
        return jnp.abs(out).mean()

    grads = jax.grad(loss_fn)(variables['params'])
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))


def test_lightcnn_and_vggface():
    from sisr_tpu.models.feature_extractors import LightCNN29, VggFace
    m = LightCNN29(num_classes=50)
    x = jnp.zeros((1, 128, 128, 1))
    v = m.init(KEY, x)
    out, fc = m.apply(v, x)
    assert out.shape == (1, 50) and fc.shape == (1, 256)
    c1, c2 = m.apply(v, x, extract_features=True)
    assert c1.shape == (1, 16, 16, 128) and c2.shape == (1, 16, 16, 128)

    vf = VggFace(mode='recognition')
    xv = jnp.zeros((1, 224, 224, 3))
    vv = vf.init(KEY, xv)
    assert vf.apply(vv, xv).shape == (1, 4096)


def test_channel_attention_rejects_zero_width_reduction():
    """channel < reduction used to build a zero-width reduce Dense whose
    1/sqrt(fan_in) init bound is inf, silently NaN-poisoning the forward."""
    import pytest
    from sisr_tpu.models.advanced import RCAN
    from sisr_tpu.models.qmodels import QRCAN
    from sisr_tpu.models.san import SAN
    x = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match='reduction'):
        RCAN(n_resgroups=1, n_resblocks=1, n_feats=8, scale=2).init(KEY, x)
    with pytest.raises(ValueError, match='reduction'):
        QRCAN(n_resgroups=1, n_resblocks=1, n_feats=8, scale=2,
              num_metadata=10).init(KEY, x, metadata=jnp.zeros((1, 10)))
    with pytest.raises(ValueError, match='reduction'):
        SAN(n_resgroups=1, n_resblocks=1, n_feats=8, scale=2).init(KEY, x)


def test_zero_width_guard_covers_all_attention_layers():
    """fan_in=0 NaN-poisoning is blocked at the dense()/conv() ROOT, so layers
    without their own channel/reduction checks (PALayer channel//8, ParaCALayer
    network_channels//multiplier) fail loudly too."""
    import pytest
    from sisr_tpu.models.q_layers import PALayer, ParaCALayer
    with pytest.raises(ValueError, match='zero-width'):
        PALayer(channel=4).init(KEY, jnp.zeros((1, 8, 8, 4)))
    with pytest.raises(ValueError, match='zero-width'):
        # network_channels // num_layers == 0 -> zero-width intermediate Dense
        ParaCALayer(network_channels=1, num_metadata=10, num_layers=2).init(
            KEY, jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 10)))


def test_sftmd_concat_with_q_injection_trains():
    """concat_strategy + q_injection together: the concat path nulls metadata in
    the base prep, but SFTMD always takes a metadata arg — this combo crashed at
    the first step trace before the handler re-supplied it."""
    import numpy as np
    from sisr_tpu.models.handlers import define_model
    h = define_model('sftmd', scale=2, num_features=8, num_blocks=1,
                     concat_strategy=True, q_injection=True,
                     metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    rng = np.random.RandomState(0)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 16, 16, 3).astype(np.float32),
             'metadata': rng.rand(2, 10).astype(np.float32)}
    loss, _ = h.run_train(**batch)
    assert np.isfinite(float(loss))
    out, _, _ = h.run_eval(batch['lr'], metadata=batch['metadata'])
    assert out.shape == (2, 16, 16, 3)


def test_qrcan_selective_meta_blocks_length_validated():
    import numpy as np
    import pytest
    from sisr_tpu.models.qmodels import QRCAN
    with pytest.raises(ValueError, match='selective_meta_blocks'):
        QRCAN(n_resgroups=3, n_resblocks=1, n_feats=16, scale=2, num_metadata=10,
              include_q_layer=True, selective_meta_blocks=[True, False]).init(
            KEY, jnp.zeros((1, 8, 8, 3)), metadata=jnp.zeros((1, 10)))


def test_qrcan_modulate_with_q_layer_builds():
    """style='modulate' + include_q_layer: metadata arrives scale_qpi-expanded to
    n_feats; the q_node MLP must size from the expanded width (the torch
    reference crashes on this combo, so no checkpoint constrains it)."""
    import numpy as np
    from sisr_tpu.models.handlers import define_model
    h = define_model('qrcan', scale=2, n_feats=16, n_resgroups=1, n_resblocks=1,
                     style='modulate', include_q_layer=True, metadata=['qpi'])
    h.set_metadata_keys(['qpi'])
    rng = np.random.RandomState(0)
    batch = {'lr': rng.rand(1, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(1, 16, 16, 3).astype(np.float32),
             'metadata': rng.rand(1, 1).astype(np.float32)}
    loss, _ = h.run_train(**batch)
    assert np.isfinite(float(loss))
    # the q_node reduce MLP consumed the EXPANDED 16-wide metadata
    q_node = h.state.params['group_0']['qrcab_0']['q_node']
    first = [v for k, v in sorted(q_node.items())][0]
    assert first['kernel'].shape[0] == 16
