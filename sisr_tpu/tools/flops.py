"""Analytic forward-FLOP models (2*MACs) for MFU accounting.

Counts every conv (3x3 unless noted) at its true spatial resolution, including the
PixelShuffle upsampler stages that run at intermediate/HR resolution.  Attention
bookkeeping (GAP, reduce/expand 1x1 "denses", sigmoid scale) is counted where it is
non-negligible; elementwise adds/activations are not (sub-0.1% for these nets).

Used by bench.py (`mfu` / `mfu_paper_scale`) and `bench_models --paper`.
"""


def _conv(hw, cin, cout, k=3):
    return 2.0 * hw * hw * cin * cout * k * k


def _upsampler(hw, feats, scale):
    """conv(f->4f)+PixelShuffle(2) chain (or one x3 stage), as in the reference
    common.Upsampler (ref: advanced/common.py:20-45)."""
    total = 0.0
    if scale == 3:
        return _conv(hw, feats, feats * 9), hw * 3
    s = scale
    while s > 1:
        total += _conv(hw, feats, feats * 4)
        hw *= 2
        s //= 2
    return total, hw


def edsr_flops_per_image(lr=128, feats=64, blocks=16, scale=4):
    """EDSR: head + residual body (2 convs/block) + body-tail + upsampler + tail."""
    total = _conv(lr, 3, feats)
    total += blocks * 2 * _conv(lr, feats, feats)
    total += _conv(lr, feats, feats)
    up, hw = _upsampler(lr, feats, scale)
    total += up + _conv(hw, feats, 3)
    return total


def qrcan_flops_per_image(lr=128, feats=64, groups=10, blocks=20, scale=4,
                          reduction=16, num_metadata=1, q_layers=2):
    """QRCAN = RCAN + one ParaCALayer per RCAB (q_layer.py MLP on the pooled
    metadata VECTOR: num_metadata -> feats/2 -> feats per image).  The meta
    MLP adds ~2*(M*f/2 + f*f/2) FLOPs per block per image — sub-0.01% of a
    block's convs at the SPL config, but counted so the QRCAN MFU row is
    labeled with its own model's arithmetic, not RCAN's."""
    sizes = [num_metadata] + [feats // m for m in range(q_layers, 0, -1)]
    para_ca = sum(2.0 * a * b for a, b in zip(sizes, sizes[1:]))
    return rcan_flops_per_image(lr, feats, groups, blocks, scale, reduction) \
        + groups * blocks * para_ca


def rcan_flops_per_image(lr=128, feats=64, groups=10, blocks=20, scale=4,
                         reduction=16):
    """RCAN: head + groups x (blocks x RCAB + group-tail conv) + body-tail +
    upsampler + tail.  An RCAB is 2 convs + CA (two 1x1 'denses' f->f/r->f on the
    pooled vector — negligible but counted)."""
    ca = 2.0 * 2 * feats * (feats // reduction)  # per image, spatially pooled
    rcab = 2 * _conv(lr, feats, feats) + ca
    total = _conv(lr, 3, feats)
    total += groups * (blocks * rcab + _conv(lr, feats, feats))
    total += _conv(lr, feats, feats)
    up, hw = _upsampler(lr, feats, scale)
    total += up + _conv(hw, feats, 3)
    return total
