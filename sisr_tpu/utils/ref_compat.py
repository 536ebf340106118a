"""Import shims for running the REFERENCE torch code side by side (read-only).

The reference targets python 3.7-era deps (toml, colorama, skvideo, torchvision,
aim, ...) that this environment lacks; these stubs satisfy its imports without
changing any behavior we compare against.  Used by ``convert_weights --verify``
(and mirrored by the parity tests in tests/).
"""
import sys
import types

DEFAULT_REF_CODE = '/root/reference/Code'

_STUB_NAMES = ['moviepy', 'moviepy.video', 'moviepy.video.io',
               'moviepy.video.io.ImageSequenceClip', 'skvideo', 'skvideo.io',
               'skvideo.utils', 'colorama', 'click_config_file', 'skimage',
               'skimage.metrics', 'skimage.io', 'torchvision',
               'torchvision.models', 'torchvision.transforms', 'aim']


def install_reference_import_shims(ref_code=None):
    """Make ``import SISR...`` / ``import sr_tools...`` work against the reference
    tree at ``ref_code``; returns the path used (raises if the tree is absent)."""
    import os
    import collections
    import collections.abc

    ref_code = ref_code or os.environ.get('SISR_REFERENCE_CODE', DEFAULT_REF_CODE)
    if not os.path.isdir(ref_code):
        raise RuntimeError('reference code tree not found at %r — pass ref_code or '
                           'set SISR_REFERENCE_CODE' % ref_code)
    if not hasattr(collections, 'Callable'):  # the reference targets older python
        collections.Callable = collections.abc.Callable
    if 'toml' not in sys.modules:
        from . import toml_io
        stub = types.ModuleType('toml')
        stub.load = toml_io.load
        stub.dump = toml_io.dump
        sys.modules['toml'] = stub
    for name in _STUB_NAMES:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == 'colorama':
                mod.init = lambda *a, **k: None
                mod.Fore = types.SimpleNamespace(RED='', GREEN='', RESET='')
            if name == 'skimage.metrics':
                mod.structural_similarity = None
            if name == 'skimage.io':
                mod.imsave = None
            if name == 'torchvision.models':
                mod.vgg19 = None
            if name == 'torchvision.transforms':
                mod.ToTensor = object
                mod.ToPILImage = object
                mod.Compose = object
            sys.modules[name] = mod
    if ref_code not in sys.path:
        sys.path.insert(0, ref_code)
    return ref_code
