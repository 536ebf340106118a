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
    from . import toml_io
    toml_stub = sys.modules.setdefault('toml', types.ModuleType('toml'))
    # UPGRADE attributes even on a pre-existing stub (another caller may have
    # installed a bare module placeholder first — the shims must compose)
    if not hasattr(toml_stub, 'load'):
        toml_stub.load = toml_io.load
    if not hasattr(toml_stub, 'dump'):
        toml_stub.dump = toml_io.dump
    for name in _STUB_NAMES:
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        if name == 'colorama' and not hasattr(mod, 'init'):
            mod.init = lambda *a, **k: None
            mod.Fore = types.SimpleNamespace(RED='', GREEN='', RESET='')
        if name == 'skimage.metrics' and not hasattr(mod, 'structural_similarity'):
            mod.structural_similarity = None
        if name == 'skimage.io' and not hasattr(mod, 'imsave'):
            mod.imsave = None
        if name == 'torchvision.models' and not hasattr(mod, 'vgg19'):
            mod.vgg19 = None
        if name == 'torchvision.transforms' and not hasattr(mod, 'ToTensor'):
            mod.ToTensor = object
            mod.ToPILImage = object
            mod.Compose = object
    if ref_code not in sys.path:
        sys.path.insert(0, ref_code)
    return ref_code
