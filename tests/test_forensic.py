"""Forensic introspection: attention probes through the handler API."""
import numpy as np

from sisr_tpu.models.handlers import define_model


def test_rcan_forensic_exposes_channel_attention():
    h = define_model('rcan', scale=2, lr=1e-4, eval_mode=True)
    # shrink via direct module override for test speed
    h.module = h.module.copy(n_resblocks=1, n_resgroups=1, n_feats=16)
    x = np.random.rand(1, 8, 8, 3).astype(np.float32)
    out, forensic = h.run_forensic(x)
    assert out.shape == (1, 16, 16, 3)
    # one CALayer per RCAB: group_0/rcab_0/ca
    ca = forensic['group_0']['rcab_0']['ca']
    mask = ca['mask_multiplier'][0]
    assert mask.shape == (1, 16)
    assert np.all((mask >= 0) & (mask <= 1))  # post-sigmoid
    assert 'inner_vector' in ca


def test_qrcan_forensic_exposes_meta_attention():
    h = define_model('qrcan', scale=2, lr=1e-4, eval_mode=True, style='max_concat',
                     include_q_layer=True, metadata=['blur_kernel'],
                     n_feats=16, n_resblocks=1, n_resgroups=1)
    h.set_metadata_keys(['blur_kernel'] * 10)
    x = np.random.rand(1, 8, 8, 3).astype(np.float32)
    meta = np.random.rand(1, 10).astype(np.float32)
    out, forensic = h.run_forensic(x, metadata=meta)
    block = forensic['group_0']['qrcab_0']
    assert 'mask_multiplier' in block['qca']
    assert 'meta_attention_map' in block['q_node']
    att = block['q_node']['meta_attention_map'][0]
    assert att.shape == (1, 16)
    # metadata must influence the sown attention
    _, forensic2 = h.run_forensic(x, metadata=meta * 3.0)
    att2 = forensic2['group_0']['qrcab_0']['q_node']['meta_attention_map'][0]
    assert np.abs(att2 - att).max() > 0
