"""Small filesystem / misc helpers shared across the framework.

Covers the utility surface of the reference's ``sr_tools/helper_functions.py`` (directory
management, image discovery, natural sorting, metadata reading).  Model-checkpoint management
helpers live in :mod:`sisr_tpu.tools.helper_cli`.
"""
from csv import DictReader
import glob
import os
import re


def atoi(text):
    return int(text) if text.isdigit() else text


def natural_keys(text):
    """Human-order sort key (ref: helper_functions.py:67-72)."""
    return [atoi(c) for c in re.split(r'(\d+)', text)]


def create_dir_if_empty(*directories):
    for directory in directories:
        os.makedirs(directory, exist_ok=True)


def extract_image_names_from_folder(folder, sorted=True, recursive=False):
    """Find all images in a folder (ref: helper_functions.py:167-177)."""
    filenames = []
    # superset of the reference's lowercase list (helper_functions.py:169):
    # camera-default .JPG/.jpeg files silently vanished on case-sensitive FSes
    for extension in ['*.jpg', '*.png', '*.bmp', '*.tif', '*.jpeg',
                      '*.JPG', '*.PNG', '*.BMP', '*.TIF', '*.JPEG']:
        if recursive:
            glob_path = os.path.join(folder, '**', extension)
        else:
            glob_path = os.path.join(folder, extension)
        filenames.extend(glob.glob(glob_path, recursive=recursive))
    if sorted:
        filenames.sort()
    return filenames


def read_metadata(file):
    """Read a one-line CSV metadata file into a dict (ref: helper_functions.py:129-138)."""
    with open(file) as mfile:
        reader = DictReader(mfile)
        data = next(reader)
    return data


def read_metadata_list(metadata_file):
    """Read a text file of metadata key names, one per line (ref: net_train.py:10-13)."""
    with open(metadata_file, 'r') as f:
        return [label.rstrip() for label in f.readlines()]


def generate_range(limits, subdivisions):
    """Split a numeric range into subdivision boundaries (ref: helper_functions.py:94-101).

    Unlike the reference's int-truncated step (which emits duplicate boundaries —
    empty randint intervals downstream — whenever the range is narrower than the
    subdivision count), boundaries are linearly spaced and strictly increasing."""
    if subdivisions < 1:
        raise ValueError('subdivisions must be >= 1 (got %d)' % subdivisions)
    span = limits[1] - limits[0]
    if span < subdivisions:
        raise ValueError('Range %s is too narrow for %d subdivisions — each '
                         'interval needs at least one integer.'
                         % (list(limits), subdivisions))
    steps = [limits[0] + round(i * span / subdivisions)
             for i in range(subdivisions + 1)]
    steps[-1] += 1
    return steps


def list_to_dict(lst):
    """List -> dict with zero values (ref: helper_functions.py:104-111)."""
    return dict.fromkeys(lst, 0)


def get_actual_issame(probe_ids, gallery_ids):
    """Exact-match matrix between probe and gallery ids (ref: helper_functions.py:114-126)."""
    return [[p == g for g in gallery_ids] for p in probe_ids]


def get_tpu_memory(msg=''):
    """Print current accelerator memory usage — TPU analog of the reference's
    nvidia-smi helper (ref: helper_functions.py:75-91)."""
    import jax
    for device in jax.local_devices():
        stats = getattr(device, 'memory_stats', lambda: None)()
        if stats:
            used = stats.get('bytes_in_use', 0)
            total = stats.get('bytes_limit', 0) or 1
            print('%s %s: %2.1f%% (%d out of %d bytes)'
                  % (msg, device, 100.0 * used / total, used, total))
        else:
            print('%s %s: memory stats unavailable' % (msg, device))
