"""Torch -> Flax weight conversion for reference checkpoints.

Converts the reference framework's torch checkpoints (dict with a ``'network'``
state_dict, ref: Code/SISR/models/__init__.py:349-464) into this framework's parameter
trees so pretrained reference models evaluate here bit-comparably (OIHW -> HWIO kernel
transpose; 1x1 attention convs -> Dense).

Supported families (all 11): srcnn, vdsr, edsr, rcan, han, qrcan(qpircan), qedsr,
srmd, san, qsan, sftmd, sparnet/qsparnet (full variables incl. BatchNorm stats).
Layout notes:
* torch Conv2d weight (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O);
* 1x1 convs acting on pooled vectors (CALayer/QCALayer/ParaCALayer) -> Dense (I, O);
* PixelShuffle channel ordering matches (see blocks.pixel_shuffle), so Upsampler convs
  transfer with a plain transpose.
"""
import numpy as np


def _conv(sd, prefix):
    w = np.asarray(sd['%s.weight' % prefix])
    entry = {'kernel': w.transpose(2, 3, 1, 0)}
    if '%s.bias' % prefix in sd:
        entry['bias'] = np.asarray(sd['%s.bias' % prefix])
    return entry


def _dense(sd, prefix):
    w = np.asarray(sd['%s.weight' % prefix])  # (O, I, 1, 1) or (O, I)
    w = w.reshape(w.shape[0], w.shape[1])
    entry = {'kernel': w.T}
    if '%s.bias' % prefix in sd:
        entry['bias'] = np.asarray(sd['%s.bias' % prefix])
    return entry


def _para_ca(sd, prefix, num_layers=2, nonlinearity=True):
    """ParaCALayer attribute_integrator Sequential -> fc_i Dense params
    (ref: q_layer.py:20-37: conv, [relu], conv, ..., sigmoid)."""
    out = {}
    idx = 0
    multiplier = num_layers
    for i in range(num_layers):
        out['fc_%d' % i] = _dense(sd, '%s.attribute_integrator.%d' % (prefix, idx))
        idx += 1
        if nonlinearity and multiplier != 1:
            idx += 1  # skip ReLU
        multiplier -= 1
    return out


def _ca_layer(sd, prefix):
    """CALayer conv_du Sequential(conv, relu, conv, sigmoid) -> du_0/du_1."""
    return {'du_0': _dense(sd, '%s.conv_du.0' % prefix),
            'du_1': _dense(sd, '%s.conv_du.2' % prefix)}


def _qca_layer(sd, prefix, style):
    """QCALayer (ref: attention_manipulators/architectures.py:34-127)."""
    out = {}
    if style in ('modulate', 'standard', 'max_concat', 'softmax'):
        out['du_0'] = _dense(sd, '%s.conv_du.0' % prefix)
        out['du_1'] = _dense(sd, '%s.conv_du.2' % prefix)
    elif style == 'mini_concat':
        out['pre_concat'] = _dense(sd, '%s.pre_concat' % prefix)
        out['du_1'] = _dense(sd, '%s.conv_du.1' % prefix)
    elif style == 'extended_attention':
        for i in range(3):
            out['feature_%d' % i] = _dense(sd, '%s.feature_convs.%d.0' % (prefix, i))
        out['final'] = _dense(sd, '%s.final_conv.0' % prefix)
    return out


def _upsampler(sd, prefix, scale):
    """common.Upsampler Sequential: convs at even indices (PixelShuffle between)."""
    out = {}
    n_stages = {2: 1, 4: 2, 8: 3, 3: 1}[scale]
    for i in range(n_stages):
        out['conv_%d' % i] = _conv(sd, '%s.%d' % (prefix, i * 2))
    return out


def convert_srcnn(sd, kernel_pattern=None, **kwargs):
    """(ref: basic/architectures.py:30-45 layer_dict naming)"""
    n = len(kernel_pattern or [9, 5, 5])
    return {'conv_%d' % i: _conv(sd, 'layer_dict.conv_%d' % i) for i in range(n)}


def convert_vdsr(sd, kernel_pattern=None, **kwargs):
    n = len(kernel_pattern or [3] * 20)
    return {'conv_%d' % i: _conv(sd, 'layer_dict.conv_%d' % i) for i in range(n)}


def convert_edsr(sd, num_blocks=16, scale=4, **kwargs):
    """(ref: advanced/architectures.py:183-225: head/body/tail Sequentials)"""
    params = {'head': _conv(sd, 'head.0')}
    for i in range(num_blocks):
        params['block_%d' % i] = {'conv_0': _conv(sd, 'body.%d.body.0' % i),
                                  'conv_1': _conv(sd, 'body.%d.body.2' % i)}
    params['body_tail'] = _conv(sd, 'body.%d' % num_blocks)
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def convert_rcan(sd, n_resgroups=10, n_resblocks=20, scale=4, **kwargs):
    """(ref: advanced/architectures.py:126-161)"""
    params = {'head': _conv(sd, 'head.0')}
    for g in range(n_resgroups):
        group = {}
        for b in range(n_resblocks):
            base = 'body.%d.body.%d' % (g, b)
            group['rcab_%d' % b] = {'conv_0': _conv(sd, '%s.body.0' % base),
                                    'conv_1': _conv(sd, '%s.body.2' % base),
                                    'ca': _ca_layer(sd, '%s.body.3' % base)}
        group['conv_tail'] = _conv(sd, 'body.%d.body.%d' % (g, n_resblocks))
        params['group_%d' % g] = group
    params['body_tail'] = _conv(sd, 'body.%d' % n_resgroups)
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def convert_han(sd, n_resgroups=10, n_resblocks=20, scale=4, **kwargs):
    """(ref: advanced/architectures.py:314-377 + HAN_blocks.py)"""
    params = convert_rcan(sd, n_resgroups, n_resblocks, scale)
    params['la'] = {'gamma': np.asarray(sd['la.gamma'])}
    csa_w = np.asarray(sd['csa.conv.weight'])  # (1, 1, 3, 3, 3) OIDHW
    params['csa'] = {'gamma': np.asarray(sd['csa.gamma']),
                     'conv3d_kernel': csa_w.transpose(2, 3, 4, 1, 0),
                     'conv3d_bias': np.asarray(sd['csa.conv.bias'])}
    params['last_conv'] = _conv(sd, 'last_conv')
    params['last'] = _conv(sd, 'last')
    return params


def convert_qrcan(sd, n_resgroups=10, n_resblocks=20, scale=4, style='modulate',
                  include_pixel_attention=False, include_q_layer=False,
                  selective_meta_blocks=None, num_q_layers_inner_residual=None,
                  **kwargs):
    """(ref: attention_manipulators/architectures.py:246-316)"""
    params = {'head': _conv(sd, 'head.0')}
    for g in range(n_resgroups):
        group = {}
        g_has_q = include_q_layer if (selective_meta_blocks is None
                                      or selective_meta_blocks[g]) else False
        for b in range(n_resblocks):
            base = 'body.%d.body.%d' % (g, b)
            block = {'conv_0': _conv(sd, '%s.body.0' % base),
                     'conv_1': _conv(sd, '%s.body.2' % base),
                     'qca': _qca_layer(sd, '%s.final_body' % base, style)}
            if include_pixel_attention:
                block['pa_node'] = {'pa_0': _conv(sd, '%s.pa_node.pa.0' % base),
                                    'pa_1': _conv(sd, '%s.pa_node.pa.2' % base)}
            q_in = g_has_q if (num_q_layers_inner_residual is None
                               or b < num_q_layers_inner_residual) else False
            if q_in:
                block['q_node'] = _para_ca(sd, '%s.q_node' % base)
            group['qrcab_%d' % b] = block
        group['final_body'] = _conv(sd, 'body.%d.final_body' % g)
        params['group_%d' % g] = group
    params['final_body'] = _conv(sd, 'final_body')
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def convert_qhan(sd, n_resgroups=10, n_resblocks=20, scale=4,
                 num_q_layers_inner_residual=None, **kwargs):
    """(ref: attention_manipulators/architectures.py:470-540 — HAN body of
    QResidualGroups with style='standard', q_layer=True, pa=False)"""
    params = {'head': _conv(sd, 'head.0')}
    for g in range(n_resgroups):
        group = {}
        for b in range(n_resblocks):
            base = 'body.%d.body.%d' % (g, b)
            block = {'conv_0': _conv(sd, '%s.body.0' % base),
                     'conv_1': _conv(sd, '%s.body.2' % base),
                     'qca': _qca_layer(sd, '%s.final_body' % base, 'standard')}
            if num_q_layers_inner_residual is None or b < num_q_layers_inner_residual:
                block['q_node'] = _para_ca(sd, '%s.q_node' % base)
            group['qrcab_%d' % b] = block
        group['final_body'] = _conv(sd, 'body.%d.final_body' % g)
        params['group_%d' % g] = group
    params['body_tail'] = _conv(sd, 'body.%d' % n_resgroups)
    params['la'] = {'gamma': np.asarray(sd['la.gamma'])}
    csa_w = np.asarray(sd['csa.conv.weight'])  # (1, 1, 3, 3, 3) OIDHW
    params['csa'] = {'gamma': np.asarray(sd['csa.gamma']),
                     'conv3d_kernel': csa_w.transpose(2, 3, 4, 1, 0),
                     'conv3d_bias': np.asarray(sd['csa.conv.bias'])}
    params['last_conv'] = _conv(sd, 'last_conv')
    params['last'] = _conv(sd, 'last')
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def convert_qedsr(sd, num_blocks=16, scale=4, q_layer_nonlinearity=False, **kwargs):
    """(ref: attention_manipulators/architectures.py:332-399)"""
    params = {'head': _conv(sd, 'head')}
    for i in range(num_blocks):
        params['block_%d' % i] = {
            'conv_0': _conv(sd, 'body.%d.body.0' % i),
            'conv_1': _conv(sd, 'body.%d.body.2' % i),
            'attention': _para_ca(sd, 'body.%d.attention_layer' % i,
                                  nonlinearity=q_layer_nonlinearity)}
    params['final_body'] = _conv(sd, 'final_body')
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def convert_srmd(sd, nb=12, **kwargs):
    """(ref: advanced/architectures.py:380-425, KAIR sequential naming model.N)"""
    params = {'conv_0': _conv(sd, 'model.0')}
    for i in range(1, nb - 1):
        params['conv_%d' % i] = _conv(sd, 'model.%d' % (2 * i))
    params['conv_tail'] = _conv(sd, 'model.%d' % (2 * (nb - 1)))
    return params


def _soca(sd, prefix):
    return _ca_layer(sd, prefix)  # identical du_0/du_1 mapping


def _non_local(sd, prefix):
    """Nonlocal_CA -> our NonlocalCA/non_local (the reference's inner dead SOCA params
    are skipped; ref: SAN_blocks.py:305-336).  g/phi are Sequential-wrapped with the
    always-on 2-D max-pool (SAN_blocks.py:88-93) -> keys g.0 / phi.0."""
    inner = '%s.non_local' % prefix
    return {'non_local': {'g': _conv(sd, '%s.g.0' % inner),
                          'theta': _conv(sd, '%s.theta' % inner),
                          'phi': _conv(sd, '%s.phi.0' % inner),
                          'w': _conv(sd, '%s.W' % inner)}}


def convert_san(sd, n_resgroups=20, n_resblocks=10, scale=4, **kwargs):
    """(ref: advanced/architectures.py:244-311 + SAN_blocks.py).  The reference's dead
    parameters (SAN.conv_last, LSRAG.gamma, Nonlocal_CA.soca) are skipped."""
    params = {'head': _conv(sd, 'head.0'), 'gamma': np.asarray(sd['gamma'])}
    for g in range(n_resgroups):
        group = {}
        for b in range(n_resblocks):
            base = 'RG.%d.rcab.%d' % (g, b)
            group['rb_%d' % b] = {'conv_0': _conv(sd, '%s.conv_first.0' % base),
                                  'conv_1': _conv(sd, '%s.conv_first.2' % base)}
        group['soca'] = _soca(sd, 'RG.%d.soca' % g)
        group['conv_last'] = _conv(sd, 'RG.%d.conv_last' % g)
        params['rg_%d' % g] = group
    params['non_local'] = _non_local(sd, 'non_local')
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def convert_qsan(sd, n_resgroups=20, n_resblocks=10, scale=4, **kwargs):
    """(ref: attention_manipulators/architectures.py:402-467 + qsan_blocks.py)"""
    params = {'head': _conv(sd, 'head.0'), 'gamma': np.asarray(sd['gamma'])}
    for g in range(n_resgroups):
        group = {}
        for b in range(n_resblocks):
            base = 'RG.%d.rcab.%d' % (g, b)
            group['qrb_%d' % b] = {'conv_0': _conv(sd, '%s.conv_first.0' % base),
                                   'conv_1': _conv(sd, '%s.conv_first.2' % base),
                                   'q_layer': _para_ca(sd, '%s.q_layer' % base)}
        group['soca'] = _soca(sd, 'RG.%d.soca' % g)
        group['conv_last'] = _conv(sd, 'RG.%d.conv_last' % g)
        params['rg_%d' % g] = group
    params['non_local'] = _non_local(sd, 'non_local')
    params['upsampler'] = _upsampler(sd, 'tail.0', scale)
    params['tail'] = _conv(sd, 'tail.1')
    return params


def _sft_layer(sd, prefix, sft_type='standard'):
    """SFT_Layer -> sft_module params (ref: SFTMD_variants/architectures.py:8-76).
    Assumes the post-legacy-rewrite naming (…sft_module…) the reference's own
    SFTMD legacy_switch produces (SFTMD_variants/handlers.py:41-60)."""
    base = '%s.sft_module' % prefix
    if sft_type == 'standard':
        return {'sft_module': {'mul_conv1': _conv(sd, '%s.mul_conv1' % base),
                               'mul_conv2': _conv(sd, '%s.mul_conv2' % base),
                               'add_conv1': _conv(sd, '%s.add_conv1' % base),
                               'add_conv2': _conv(sd, '%s.add_conv2' % base)}}
    if sft_type == 'concat':
        return {'sft_module': {'conv': _conv(sd, '%s.conv' % base)}}
    return {}  # weak / none have no parameters


def convert_sftmd(sd, num_blocks=16, scale=4, sft_type='standard', q_injection=False,
                  q_layers=2, **kwargs):
    """(ref: SFTMD_variants/architectures.py:107-176)"""
    params = {'conv1': _conv(sd, 'conv1'), 'conv2': _conv(sd, 'conv2'),
              'conv3': _conv(sd, 'conv3')}
    for i in range(1, num_blocks + 1):
        base = 'SFT-residual%d' % i
        block = {'conv1': _conv(sd, '%s.conv1' % base),
                 'conv2': _conv(sd, '%s.conv2' % base)}
        block['sft1'] = _sft_layer(sd, '%s.sft1' % base, sft_type)
        block['sft2'] = _sft_layer(sd, '%s.sft2' % base, sft_type)
        if q_injection:
            block['q_1'] = _para_ca(sd, '%s.q_1' % base, num_layers=q_layers)
            block['q_2'] = _para_ca(sd, '%s.q_2' % base, num_layers=q_layers)
        params['sft_residual_%d' % i] = block
    params['sft'] = _sft_layer(sd, 'sft', sft_type)
    if q_injection:
        params['final_injection'] = _para_ca(sd, 'final_injection', num_layers=q_layers)
    params['conv_mid'] = _conv(sd, 'conv_mid')
    if scale == 4:  # two conv+PS(2) stages: convs at Sequential indices 0 and 3
        params['up_conv1'] = _conv(sd, 'upscale.0')
        params['up_conv2'] = _conv(sd, 'upscale.3')
    else:
        params['up_conv1'] = _conv(sd, 'upscale.0')
    params['conv_output'] = _conv(sd, 'conv_output')
    return params


def _set_path(tree, path, value):
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def convert_sparnet(sd, **kwargs):
    """SPARNet/QSPARNet (ref: SPARNet/{architectures,blocks}.py).

    Key-driven walker (robust to any size config).  Returns
    ``{'params': ..., 'batch_stats': ...}`` — BatchNorm running stats live in a separate
    flax collection.  Use :func:`convert_torch_variables` for this family.
    """
    params, batch_stats = {}, {}

    def block_name(section, idx):
        if section == 'encoder':
            return 'encoder_%d' % idx
        if section == 'res_layers':
            return 'res_%d' % idx
        if section == 'decoder':
            return 'decoder_%d' % idx
        raise KeyError(section)

    for key, value in sd.items():
        parts = key.split('.')
        value = np.asarray(value)
        if parts[-1] == 'num_batches_tracked':
            continue
        if parts[0] == 'out_conv':
            prefix = ['out_conv']
            rest = parts[1:]
        else:
            prefix = [block_name(parts[0], int(parts[1]))]
            rest = parts[2:]

        # translate the inner module path
        path = list(prefix)
        i = 0
        is_bn_stat = False
        while i < len(rest):
            p = rest[i]
            if p == 'conv2d':
                path += ['conv2d']
            elif p == 'shortcut_func':
                path += ['shortcut']
            elif p == 'preact_func':
                nxt = rest[i + 1]
                path += ['preact_norm', 'norm'] if nxt == '0' else ['preact_relu']
                i += 2  # consume the index and the trailing 'norm'/'func' token
            elif p == 'norm' and rest[i + 1] == 'norm':
                path += ['norm', 'norm']
                i += 1
            elif p == 'relu' and rest[i + 1] == 'func':
                path += ['relu']
                i += 1
            elif p == 'out_block' and rest[i + 1] == '0':
                path += ['out_block']
                i += 1
            elif p == 'metadata_attention':
                path += ['metadata_attention']
            elif p == 'attribute_integrator':
                # ParaCALayer: conv indices 0,2 -> fc_0, fc_1 (nonlinearity=True)
                path += ['fc_%d' % (int(rest[i + 1]) // 2)]
                i += 1
            elif p in ('weight', 'bias', 'running_mean', 'running_var'):
                break
            else:
                path += [p]
            i += 1

        leaf = rest[-1]
        in_bn = path[-1] == 'norm'
        if leaf == 'weight':
            if in_bn:
                _set_path(params, path + ['scale'], value)
            elif path[-1] in ('relu', 'preact_relu'):
                _set_path(params, path + ['prelu'], value)
            elif path[-1].startswith('fc_'):  # ParaCALayer 1x1 conv -> Dense
                _set_path(params, path + ['kernel'],
                          value.reshape(value.shape[0], value.shape[1]).T)
            elif value.ndim == 4:
                _set_path(params, path + ['kernel'], value.transpose(2, 3, 1, 0))
            else:
                _set_path(params, path + ['kernel'], value.T if value.ndim == 2
                          else value)
        elif leaf == 'bias':
            _set_path(params, path + ['bias'], value)
        elif leaf == 'running_mean':
            _set_path(batch_stats, path + ['mean'], value)
        elif leaf == 'running_var':
            _set_path(batch_stats, path + ['var'], value)

    return {'params': params, 'batch_stats': batch_stats}


CONVERTERS = {
    'srcnn': convert_srcnn,
    'vdsr': convert_vdsr,
    'edsr': convert_edsr,
    'rcan': convert_rcan,
    'han': convert_han,
    'qrcan': convert_qrcan,
    'qpircan': convert_qrcan,
    'qhan': convert_qhan,
    'qedsr': convert_qedsr,
    'srmd': convert_srmd,
    'san': convert_san,
    'qsan': convert_qsan,
    'sftmd': convert_sftmd,
    'sparnet': convert_sparnet,
    'qsparnet': convert_sparnet,
}

# families whose converter returns full variables ({'params', 'batch_stats'})
_FULL_VARIABLES = {'sparnet', 'qsparnet'}


def legacy_switch(state_dict):
    """Strip legacy 'model.module.'/'model.' key prefixes (ref: models/__init__.py:388-398)."""
    new = {}
    for k, v in state_dict.items():
        if k[:13] == 'model.module.':
            new[k[13:]] = v
        elif k[:6] == 'model.':
            new[k[6:]] = v
        else:
            new[k] = v
    return new


def sftmd_legacy_switch(state_dict):
    """SFTMD-specific key aging repairs, applied after the prefix strip
    (ref: SFTMD_variants/handlers.py:41-60): drop dead 'sft_branch' entries and
    rewrite pre-refactor SFT layer names ('sft1.'/'sft2.'/'sft.') to the modern
    '…sft_module…' nesting the converters expect."""
    new = {}
    for k, v in state_dict.items():
        if 'sft_branch' in k:
            continue
        elif 'sft_module' in k:
            new[k] = v
        elif 'sft1' in k or 'sft2' in k:
            new[k.replace('sft1', 'sft1.sft_module').replace(
                'sft2', 'sft2.sft_module')] = v
        elif k[:4] == 'sft.':
            new[k.replace('sft.', 'sft.sft_module.')] = v
        else:
            new[k] = v
    return new


# models whose checkpoints must NOT go through the legacy prefix-strip (their own top
# module is literally called 'model' — ref: advanced/handlers.py:147 legacy_load=False)
_NO_LEGACY = {'srmd'}

# model-specific post-strip rewrites (ref: SFTMD handler's legacy_switch overload)
_EXTRA_LEGACY = {'sftmd': sftmd_legacy_switch}


def _apply_legacy(model_name, state_dict, legacy):
    if legacy is None:
        legacy = model_name not in _NO_LEGACY
    if legacy:
        state_dict = legacy_switch(state_dict)
        extra = _EXTRA_LEGACY.get(model_name)
        if extra is not None:
            state_dict = extra(state_dict)
    return state_dict


class _TrackingDict(dict):
    """Records key accesses so unconsumed checkpoint weights can be reported."""

    def __init__(self, *args):
        super().__init__(*args)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if key in self:
            self.accessed.add(key)
        return super().get(key, default)

    def __contains__(self, key):
        r = super().__contains__(key)
        if r:
            self.accessed.add(key)
        return r

    def items(self):
        # key-walk converters (sparnet) enumerate and map EVERY entry
        self.accessed.update(super().keys())
        return super().items()

    def keys(self):
        self.accessed.update(super().keys())
        return super().keys()

    def __iter__(self):
        self.accessed.update(super().keys())
        return super().__iter__()


# reference checkpoints carry parameters their own forward never uses (SAN's
# top-level conv_last, LSRAG.gamma, the Nonlocal_CA soca branch — see
# convert_san's docstring); these are EXPECTED leftovers, not conversion gaps
_DEAD_REFERENCE_KEYS = {
    'san': (r'^conv_last\.', r'^RG\.\d+\.gamma$', r'soca\.'),
    'qsan': (r'^conv_last\.', r'^RG\.\d+\.gamma$', r'soca\.'),
}


def infer_structure_kwargs(model_name, state_dict):
    """Infer meta-attention structure flags the import CLI cannot know from the
    checkpoint's key layout (a checkpoint trained with include_q_layer=True would
    otherwise import 'successfully' with its q_node weights silently dropped)."""
    keys = list(state_dict)
    inferred = {}
    if model_name in ('qrcan', 'qpircan'):
        q_groups = sorted({int(k.split('.')[1]) for k in keys
                           if '.q_node.' in k and k.startswith('body.')})
        all_groups = sorted({int(k.split('.')[1]) for k in keys
                             if k.startswith('body.') and k.split('.')[1].isdigit()
                             and '.body.' in k})
        if q_groups:
            inferred['include_q_layer'] = True
            if all_groups and q_groups != all_groups:
                inferred['selective_meta_blocks'] = [g in set(q_groups)
                                                     for g in range(len(all_groups))]
        if any('.pa_node.' in k for k in keys):
            inferred['include_pixel_attention'] = True
    return inferred


def convert_torch_state_dict(model_name, state_dict, legacy=None, **model_kwargs):
    """Convert a torch ``network`` state_dict to a flax params dict."""
    return convert_torch_variables(model_name, state_dict, legacy,
                                   **model_kwargs)['params']


def convert_torch_variables(model_name, state_dict, legacy=None, **model_kwargs):
    """Like convert_torch_state_dict but returns the full flax variables dict
    ({'params': ..., 'batch_stats': ...} where applicable)."""
    if model_name not in CONVERTERS:
        raise NotImplementedError('No torch->flax converter for %r yet '
                                  '(available: %s)' % (model_name, sorted(CONVERTERS)))
    state_dict = _apply_legacy(model_name, state_dict, legacy)
    sd = _TrackingDict({k: np.asarray(v) for k, v in state_dict.items()})
    out = CONVERTERS[model_name](sd, **model_kwargs)
    import re as _re
    dead = [_re.compile(pat) for pat in _DEAD_REFERENCE_KEYS.get(model_name, ())]
    leftovers = {k for k in dict.keys(sd) if k not in sd.accessed
                 and not k.endswith('num_batches_tracked')
                 and not any(d.search(k) for d in dead)}
    if leftovers:
        # silently dropping weights imports a broken model that evals without any
        # error — fail loudly and name the structure kwargs that select them
        raise RuntimeError(
            'Converter for %r left %d checkpoint weight(s) unconsumed (e.g. %s) — '
            'the architecture kwargs do not match the checkpoint (meta-attention '
            'flags like include_q_layer/include_pixel_attention, block counts, or '
            'sft_type). Hint: infer_structure_kwargs(%r, state_dict) -> %s'
            % (model_name, len(leftovers), sorted(leftovers)[:4], model_name,
               infer_structure_kwargs(model_name, state_dict)))
    if model_name in _FULL_VARIABLES:
        return out
    return {'params': out}


def convert_torch_checkpoint(path, model_name=None, **model_kwargs):
    """Load a reference torch checkpoint file and convert its network weights."""
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(state, dict) and 'network' in state:
        name = model_name or state.get('model_name')
        network = {k: v.numpy() for k, v in state['network'].items()}
    else:  # bare state_dict (convert_pre_trained_model input)
        name = model_name
        network = {k: v.numpy() for k, v in state.items()}
    if name == 'qpircan':
        name = 'qrcan'
    return name, convert_torch_state_dict(name, network, **model_kwargs)


def import_reference_experiment(checkpoint_path, out_dir, experiment=None,
                                model_name=None, epoch=None, scale=4, **model_kwargs):
    """Convert a reference torch checkpoint into a ready-to-evaluate experiment folder.

    Produces ``<out_dir>/<experiment>/{config.toml, saved_models/train_model_<N>}`` in
    this framework's format, so ``eval_sisr -me <experiment> <N>`` works directly on
    reference (e.g. Zenodo) weights.  The reference analogue is
    ``convert_pre_trained_model`` (ref: helper_functions.py:208-211).
    """
    import os
    import torch
    from flax import serialization
    from ..utils import toml_io
    from ..utils.helpers import create_dir_if_empty
    from ..models.handlers import define_model

    state = torch.load(checkpoint_path, map_location='cpu', weights_only=False)
    if isinstance(state, dict) and 'network' in state:
        name = model_name or state.get('model_name')
        network = {k: np.asarray(v) for k, v in state['network'].items()}
        epoch = state.get('model_epoch', 0) if epoch is None else epoch
    else:
        name = model_name
        network = {k: np.asarray(v) for k, v in state.items()}
        epoch = epoch or 0
    if name == 'qpircan':
        name = 'qrcan'
    if name is None:
        raise RuntimeError('Checkpoint has no model_name — pass model_name explicitly.')

    # structure flags the CLI cannot know (q_node/pa_node presence) are read off
    # the checkpoint's own key layout; explicit kwargs win
    model_kwargs = {**infer_structure_kwargs(name, network), **model_kwargs}
    # scale shapes the converted tree (tail pixel-shuffle stage count) — forward
    # it, or a non-x4 checkpoint converts against the wrong upsampler structure
    variables = convert_torch_variables(name, network, scale=scale, **model_kwargs)

    experiment = experiment or os.path.splitext(os.path.basename(checkpoint_path))[0]
    base = os.path.join(out_dir, experiment)
    create_dir_if_empty(base, os.path.join(base, 'saved_models'),
                        os.path.join(base, 'result_outputs'))

    internal = {'scale': scale, **{k: v for k, v in model_kwargs.items()
                                   if v is not None}}
    with open(os.path.join(base, 'config.toml'), 'w') as f:
        toml_io.dump({'model': {'name': name, 'internal_params': internal}}, f)

    # build a handler to obtain a correctly-structured optimizer state, then load params
    handler = define_model(name, eval_mode=False, scale=scale, **model_kwargs)
    if handler.uses_metadata:
        handler.set_metadata_keys(None)
    handler.init_state()
    state_dict = {
        'network': serialization.to_state_dict(
            __import__('jax').tree.map(np.asarray, variables['params'])),
        'optimizer': serialization.to_state_dict(handler.state.opt_state),
        'batch_stats': serialization.to_state_dict(variables.get('batch_stats') or {}),
        'step': np.zeros((), np.int32),
        'model_name': name,
        'model_epoch': int(epoch),
    }
    path = os.path.join(base, 'saved_models', 'train_model_%d' % int(epoch))
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(state_dict))
    print('Imported %s checkpoint -> %s (epoch %d)' % (name, path, int(epoch)))
    return base


def verify_reference_import(checkpoint_path, base, ref_code=None, spatial=(16, 16)):
    """Run the reference torch model AND the imported flax experiment on the same
    seeded probe; return max |delta| over the raw model outputs.

    One-command validation for released (e.g. Zenodo) reference checkpoints: needs
    the reference code tree (``SISR_REFERENCE_CODE`` or /root/reference/Code) to
    build the torch side — the reference handler is constructed through the
    reference's OWN registry (``ModelInterface.define_model``) and the checkpoint is
    loaded through its own ``load_model`` (ref: SISR/models/__init__.py:411-464), so
    the comparison covers the reference's full load path, not just the state_dict.
    """
    import os
    import torch
    from ..utils.ref_compat import install_reference_import_shims
    from ..utils import toml_io
    from ..models.interface import ModelInterface

    install_reference_import_shims(ref_code)
    import SISR.models as ref_models

    cfg = toml_io.load(os.path.join(base, 'config.toml'))['model']
    name, internal = cfg['name'], dict(cfg['internal_params'])

    state = torch.load(checkpoint_path, map_location='cpu', weights_only=False)
    if not (isinstance(state, dict) and 'network' in state):
        state = {'network': state, 'optimizer': {}, 'model_name': name,
                 'model_epoch': 0}
    state.setdefault('model_name', name)
    state.setdefault('model_epoch', 0)  # the ref load path indexes it directly
    # load the epoch the experiment was IMPORTED under (an --epoch override means
    # the checkpoint's own model_epoch points at a file that doesn't exist here)
    import glob as _glob
    saved = _glob.glob(os.path.join(base, 'saved_models', 'train_model_*'))
    if saved:
        epoch = max(int(os.path.basename(p_).split('train_model_')[1])
                    for p_ in saved)
    else:
        epoch = int(state.get('model_epoch', 0))

    ref_handler = ref_models.ModelInterface.define_model(
        name=name, model_save_dir=os.path.join(base, 'saved_models'),
        device=torch.device('cpu'), eval_mode=True, **internal)
    ref_handler.load_model('train_model', epoch, legacy=ref_handler.legacy_load,
                           preloaded_state=state)

    iface = ModelInterface(os.path.dirname(base), os.path.basename(base),
                           load_epoch=epoch, scale=internal.get('scale'))
    ours = iface.model

    rng = np.random.RandomState(0)
    h, w = spatial
    x = rng.rand(1, h, w, ours.in_channels).astype(np.float32)
    kwargs_t, kwargs_f = {}, {}
    if ours.uses_metadata:
        meta_names = internal.get('metadata') or ['qpi']
        n_meta = ours.num_metadata
        if len(meta_names) != 1:
            raise RuntimeError('--verify supports a single metadata source; verify '
                               'multi-source models through eval_sisr instead.')
        ours.set_metadata_keys([meta_names[0]] * n_meta)
        meta = rng.rand(1, n_meta).astype(np.float32)
        kwargs_t = {'metadata': torch.from_numpy(meta),
                    'metadata_keys': [(meta_names[0],)] * n_meta}
        kwargs_f = {'metadata': meta}

    ref_handler.net.eval()
    with torch.no_grad():
        ref_out, _, _ = ref_handler.run_eval(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), **kwargs_t)
    ref_out = np.asarray(ref_out).transpose(0, 2, 3, 1)
    out, _, _ = ours.run_eval(x, **kwargs_f)
    delta = float(np.abs(np.asarray(out, np.float32) - ref_out).max())
    print('verify %s (epoch %d): max |torch - flax| = %.3g on a %dx%d probe'
          % (name, epoch, delta, h, w))
    return delta


def import_reference_model_cli():
    """console script: import_reference_model"""
    import click

    @click.command()
    @click.option('--checkpoint', required=True, help='Reference torch checkpoint file.')
    @click.option('--out_dir', required=True, help='Experiment parent directory.')
    @click.option('--experiment', default=None, help='Experiment name.')
    @click.option('--model_name', default=None,
                  help='Model registry name (read from the checkpoint if present).')
    @click.option('--epoch', default=None, type=int, help='Epoch tag for the checkpoint.')
    @click.option('--scale', default=4, help='SR scale.', show_default=True)
    @click.option('--verify', is_flag=True,
                  help='After converting, run the reference torch model and the '
                       'imported model on the same probe and print max |delta| '
                       '(needs the reference code tree: SISR_REFERENCE_CODE).')
    def run(checkpoint, out_dir, experiment, model_name, epoch, scale, verify):
        """Convert a reference torch checkpoint into an evaluable experiment folder."""
        from ..utils.platform import apply_platform_env
        apply_platform_env()
        base = import_reference_experiment(checkpoint, out_dir, experiment=experiment,
                                           model_name=model_name, epoch=epoch,
                                           scale=scale)
        if verify:
            delta = verify_reference_import(checkpoint, base)
            if delta > 5e-3:
                raise SystemExit('verification FAILED: max |delta| %.3g > 5e-3'
                                 % delta)

    run()
