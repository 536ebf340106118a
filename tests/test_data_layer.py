"""Data-layer feature coverage with synthesized fixtures: _qN group tags, QPI
normalization/filtering/sorting, blacklists, shortlists, online degradations, CelebA
attributes, split selection."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from sisr_tpu.data.datasets import SuperResImages, read_augmentation_list
from sisr_tpu.data.loader import DataLoader, CelebaSplitSampler

pytestmark = pytest.mark.slow

SET5 = '/root/reference/Data/example_data/Set5'


@pytest.fixture(scope='module')
def dataset_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp('data')
    hr_dir = root / 'hr'
    lr_dir = root / 'lr'
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        hr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / ('im%d.png' % i))
        for q in range(2):  # two compression versions per image: im0_q0.png, im0_q1.png
            lr = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
            name = 'im%d_q%d.png' % (i, q)
            Image.fromarray(lr).save(lr_dir / name)
            rows.append({'image': name,
                         'blur_kernel': json.dumps(list(rng.rand(10))),
                         'QPI': int(22 + 3 * i + q)})
    pd.DataFrame(rows).set_index('image').to_csv(lr_dir / 'degradation_metadata.csv')
    return str(lr_dir), str(hr_dir)


def test_group_tags_and_metadata(dataset_dirs):
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4,
                        degradation_metadata_file=os.path.join(
                            lr_dir, 'degradation_metadata.csv'))
    assert len(ds) == 12  # both _q groups
    item = ds[0]
    assert item['lr'].shape == (8, 8, 3)
    assert item['hr'].shape == (32, 32, 3)
    assert item['metadata'].shape == (11,)  # 10 blur + 1 qpi
    assert ds.metadata_keys == ['blur_kernel'] * 10 + ['qpi']
    # QPI normalized to the fixed (20, 40) range
    qpis = [ds[i]['metadata'][-1] for i in range(len(ds))]
    assert all(0 <= q <= 1.0 for q in qpis)


def test_group_select(dataset_dirs):
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, group_select='1')
    assert len(ds) == 6
    assert all('_q1' in n for n in ds.lr_filenames)


def test_qpi_selection_filters_images(dataset_dirs):
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, qpi_selection=(22, 28),
                        degradation_metadata_file=os.path.join(
                            lr_dir, 'degradation_metadata.csv'))
    # QPI values 22..38; only 22..28 retained
    assert 0 < len(ds) < 12


def test_qpi_sort(dataset_dirs):
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, qpi_sort=True,
                        degradation_metadata_file=os.path.join(
                            lr_dir, 'degradation_metadata.csv'))
    qpis = [m[-1] for m in ds.metadata]
    assert qpis == sorted(qpis)


def test_blacklist_and_shortlist(dataset_dirs, tmp_path):
    lr_dir, hr_dir = dataset_dirs
    blacklist = tmp_path / 'blacklist.csv'
    blacklist.write_text('Images\nim0.png\n')
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, blacklist=str(blacklist))
    assert len(ds) == 10  # im0's two variants removed

    shortlist = tmp_path / 'shortlist.txt'
    shortlist.write_text('im1.png\nim2.png\n')
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split=None, input='unmodified',
                        colorspace='rgb', scale=4, image_shortlist=str(shortlist))
    assert len(ds) == 4


def test_custom_split(dataset_dirs):
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='train', input='unmodified',
                        colorspace='rgb', scale=4, custom_split=(1, 4))
    assert len(ds) == 6  # 3 base images x 2 groups


def test_online_degradations(dataset_dirs):
    _, hr_dir = dataset_dirs
    np.random.seed(3)
    ds = SuperResImages(hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, online_degradations=True,
                        online_degradation_params={'kernel': 21, 'noise': False,
                                                   'noise_high': 0.0})
    assert len(ds) == 6
    item = ds[0]
    assert item['lr'].shape == (8, 8, 3)
    assert item['hr'].shape == (32, 32, 3)
    assert item['metadata'].shape == (10,)  # PCA kernel code
    assert item['blur_kernels'].shape == (21, 21)
    assert ds.metadata_keys == ['blur_kernel'] * 10


def test_celeba_attributes_and_sampler(tmp_path):
    rng = np.random.RandomState(1)
    hr_dir = tmp_path / 'hr'
    lr_dir = tmp_path / 'lr'
    hr_dir.mkdir()
    lr_dir.mkdir()
    n = 6
    for i in range(n):
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
            lr_dir / ('%06d.png' % i))
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            hr_dir / ('%06d.png' % i))
    # celeba-style attributes file: count line, header, rows (+1/-1)
    attr = tmp_path / 'attrs.txt'
    lines = ['%d' % n, 'Male Young']
    for i in range(n):
        lines.append('%06d.jpg %d %d' % (i, 1 if i % 2 else -1, 1))
    attr.write_text('\n'.join(lines) + '\n')

    ds = SuperResImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir), split='all',
                        input='unmodified', colorspace='rgb', scale=4,
                        metadata=['gender'], data_attributes=str(attr))
    assert ds.metadata_keys == ['gender']
    assert ds[1]['metadata'].shape == (1,)
    genders = [float(ds[i]['metadata'][0]) for i in range(n)]
    assert set(genders) == {0.0, 1.0}

    sampler = CelebaSplitSampler(ds, selected_attribute='gender')
    order = list(iter(sampler))
    assert len(order) == n
    # positives (gender==1) first
    first_half = [genders[i] for i in order[:len(sampler.positive_indices)]]
    assert all(g == 1.0 for g in first_half)


def test_loader_multithreaded_order(dataset_dirs):
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=4)
    tags = []
    for batch in loader:
        tags.extend(batch['tag'])
    assert tags == [ds[i]['tag'] for i in range(len(ds))]  # order preserved


def test_device_online_degradations_end_to_end(dataset_dirs):
    """online_degradation_params.device=true: LR synthesized inside the train step."""
    _, hr_dir = dataset_dirs
    from sisr_tpu.models.handlers import define_model
    np.random.seed(7)
    ds = SuperResImages(hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, online_degradations=True,
                        online_degradation_params={'device': True, 'noise': False,
                                                   'noise_high': 0.0})
    item = ds[0]
    assert item['blur_kernels'].shape == (21, 21)
    assert item['metadata'].shape == (10,)
    assert np.all(item['lr'] == 0)  # placeholder, filled on device

    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    h = define_model('edsr', num_features=8, num_blocks=1, scale=4, lr=1e-3)
    h.set_metadata_keys(ds.metadata_keys)
    h.device_degrade = True
    loss1, _ = h.run_train(**batch)
    loss2, _ = h.run_train(**batch)
    assert np.isfinite(float(loss1)) and float(loss2) < float(loss1) * 1.5
    assert int(h.state.step) == 2


def test_concat_dataset_forwards_device_mode(dataset_dirs):
    from sisr_tpu.data.loader import ConcatDataset
    _, hr_dir = dataset_dirs
    np.random.seed(9)
    kwargs = dict(hr_dir=hr_dir, split='all', input='unmodified', colorspace='rgb',
                  scale=4, online_degradations=True,
                  online_degradation_params={'device': True, 'noise': False})
    cat = ConcatDataset([SuperResImages(**kwargs), SuperResImages(**kwargs)])
    assert cat.device_degradations is True
    host = SuperResImages(hr_dir=hr_dir, split='all', input='unmodified',
                          colorspace='rgb', scale=4, online_degradations=True,
                          online_degradation_params={'noise': False, 'noise_high': 0.0})
    with pytest.raises(RuntimeError, match='mix device-mode'):
        ConcatDataset([SuperResImages(**kwargs), host])


def test_device_mode_rejected_for_eval_usage(dataset_dirs):
    _, hr_dir = dataset_dirs
    with pytest.raises(RuntimeError, match='placeholder LR'):
        SuperResImages(hr_dir=hr_dir, split='all', input='unmodified',
                       colorspace='rgb', scale=4, online_degradations=True,
                       online_degradation_params={'device': True, 'noise': False},
                       usage='eval')


def test_request_crops_collate_repeats_companions(dataset_dirs):
    """Flattened crop stacks must repeat per-item metadata/kernels per crop."""
    lr_dir, hr_dir = dataset_dirs
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, random_crop=4, request_crops=3,
                        degradation_metadata_file=os.path.join(
                            lr_dir, 'degradation_metadata.csv'))
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    assert batch['lr'].shape == (6, 4, 4, 3)
    assert batch['hr'].shape == (6, 16, 16, 3)
    assert batch['metadata'].shape == (6, 11)
    np.testing.assert_array_equal(batch['metadata'][0], batch['metadata'][2])
    assert not np.array_equal(batch['metadata'][0], batch['metadata'][3])


def test_constant_metadata_column_does_not_nan(tmp_path):
    """A constant-valued (float or int) column must pin to 0, not 0/0 -> NaN."""
    p = tmp_path / 'meta.csv'
    pd.DataFrame({'blur_sigma': [2.0, 2.0, 2.0]},
                 index=['a.png', 'b.png', 'c.png']).to_csv(p)
    d, keys = read_augmentation_list(str(p), filenames=['a.png', 'b.png', 'c.png'])
    assert keys == ['blur_sigma']
    assert all(np.isfinite(v).all() and v[0] == 0.0 for v in d.values())

    # constant QPI + selection cutoffs: the range filter must still hold
    pd.DataFrame({'QPI': [23.0, 23.0]}, index=['a.png', 'b.png']).to_csv(p)
    d, _ = read_augmentation_list(str(p), filenames=['a.png', 'b.png'],
                                  force_qpi_range=False, qpi_selection=[20, 25])
    assert sorted(d) == ['a.png', 'b.png']
    d, _ = read_augmentation_list(str(p), filenames=['a.png', 'b.png'],
                                  force_qpi_range=False, qpi_selection=[30, 40])
    assert sorted(d) == []


def test_split_none_returns_all_images():
    """split=None is an accepted constructor value and must behave like 'all'."""
    from sisr_tpu.data.datasets import SuperResImages
    ds = SuperResImages(lr_dir=os.path.join(SET5, 'lr_random_blur'),
                        hr_dir=os.path.join(SET5, 'hr'), split=None,
                        colorspace='rgb', y_only=False, input='unmodified', scale=4)
    assert len(ds) == 5


def test_interp_crop_alignment():
    """interp-input datasets carry an HR-sized LR: random crops must align 1:1
    (the crop offset must NOT be scaled by the SR factor)."""
    from sisr_tpu.data.datasets import SuperResImages
    ds = SuperResImages(lr_dir=os.path.join(SET5, 'hr'),
                        hr_dir=os.path.join(SET5, 'hr'), split='all',
                        colorspace='rgb', y_only=False, input='interp', scale=4,
                        random_crop=16)
    for i in range(len(ds)):
        item = ds[i]
        assert item['lr'].shape == (16, 16, 3)
        assert item['hr'].shape == (16, 16, 3)
        # same source dir + aligned offsets -> identical patches
        np.testing.assert_array_equal(item['lr'], item['hr'])


def test_cache_decoded_images():
    """Opt-in decoded-image cache: identical outputs, decode happens once."""
    from sisr_tpu.data.datasets import SuperResImages
    lr = os.path.join(SET5, 'lr_random_blur')
    hr = os.path.join(SET5, 'hr')
    base = SuperResImages(lr_dir=lr, hr_dir=hr, split='all', input='unmodified',
                          colorspace='rgb', y_only=False, scale=4,
                          degradation_metadata_file=os.path.join(
                              lr, 'degradation_metadata.csv'), metadata='all')
    cached = SuperResImages(lr_dir=lr, hr_dir=hr, split='all', input='unmodified',
                            colorspace='rgb', y_only=False, scale=4,
                            degradation_metadata_file=os.path.join(
                                lr, 'degradation_metadata.csv'), metadata='all',
                            cache_decoded=True)
    assert cached._decode_cache == {}
    for i in range(len(base)):
        a, b = base[i], cached[i]
        np.testing.assert_array_equal(a['lr'], b['lr'])
        np.testing.assert_array_equal(a['hr'], b['hr'])
    n_entries = len(cached._decode_cache)
    assert n_entries == 10  # 5 lr + 5 hr decoded once
    bytes_first = cached._decode_cache_bytes
    for i in range(len(cached)):  # epoch 2: served from cache, nothing re-inserted
        cached[i]
    assert len(cached._decode_cache) == n_entries
    assert cached._decode_cache_bytes == bytes_first

    # byte cap respected: tiny cap -> nothing cached, outputs still correct
    capped = SuperResImages(lr_dir=lr, hr_dir=hr, split='all', input='unmodified',
                            colorspace='rgb', y_only=False, scale=4,
                            degradation_metadata_file=os.path.join(
                                lr, 'degradation_metadata.csv'), metadata='all',
                            cache_decoded=2)
    np.testing.assert_array_equal(capped[0]['lr'], base[0]['lr'])
    assert capped._decode_cache == {}


def test_device_collate_stacks_in_hbm():
    """DataLoader.device_collate keeps uniform uint8 images as lists; the
    device_prefetch wrapper uploads them individually and stacks in HBM — the
    result must equal the host-stacked batch exactly.  Ragged lists pass through
    untouched (per-image eval fallback)."""
    import numpy as np
    from sisr_tpu.data.loader import _collate, device_prefetch
    rng = np.random.RandomState(0)
    items = [{'lr': rng.randint(0, 255, (4, 4, 3), np.uint8),
              'hr': rng.randint(0, 255, (8, 8, 3), np.uint8),
              'metadata': np.float32(i), 'tag': 't%d' % i} for i in range(3)]
    host = _collate(items, device_images=False)
    dev = _collate(items, device_images=True)
    assert isinstance(dev['lr'], list) and isinstance(dev['hr'], list)
    [up] = list(device_prefetch(iter([dev])))
    assert up['lr'].shape == (3, 4, 4, 3) and up['hr'].shape == (3, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(up['lr']), host['lr'])
    np.testing.assert_array_equal(np.asarray(up['hr']), host['hr'])
    assert up['tag'] == ['t0', 't1', 't2']
    # ragged lists survive device_prefetch untouched
    ragged = {'lr': [rng.randint(0, 255, (4, 4, 3), np.uint8),
                     rng.randint(0, 255, (5, 5, 3), np.uint8)], 'tag': ['a', 'b']}
    [thru] = list(device_prefetch(iter([ragged])))
    assert isinstance(thru['lr'], list) and thru['lr'][1].shape == (5, 5, 3)


def test_center_crop_np_pads_like_pil():
    """When the crop target exceeds the image, PIL's crop pads with black; the
    numpy version must match (a naive negative slice would wrap around)."""
    import numpy as np
    import PIL.Image
    from sisr_tpu.ops.transforms import center_crop, center_crop_np
    rng = np.random.RandomState(0)
    for (ih, iw), (th, tw) in [((10, 12), (6, 8)), ((6, 8), (10, 12)),
                               ((10, 6), (6, 10)), ((7, 7), (7, 9))]:
        arr = rng.randint(0, 255, (ih, iw, 3), np.uint8)
        ref = np.asarray(center_crop(PIL.Image.fromarray(arr), th, tw))
        got = center_crop_np(arr, th, tw)
        np.testing.assert_array_equal(got, ref)


def test_noise_degradation_registers_metadata_key(dataset_dirs):
    """With noise enabled the degrader emits para_in+1 code entries; the dataset
    must register the extra 'noise' key so the key mask doesn't silently truncate
    the noise conditioning (the reference never registers it)."""
    _, hr_dir = dataset_dirs
    np.random.seed(3)
    ds = SuperResImages(hr_dir=hr_dir, split='all', input='unmodified',
                        colorspace='rgb', scale=4, online_degradations=True,
                        online_degradation_params={'noise': True,
                                                   'noise_high': 0.08,
                                                   'rate_cln': 0.0})
    assert ds.metadata_keys == ['blur_kernel'] * 10 + ['noise']
    item = ds[0]
    assert item['metadata'].shape == (11,)
    # device mode must reject noise loudly instead of silently skipping it
    import pytest
    with pytest.raises(ValueError, match='noise'):
        SuperResImages(hr_dir=hr_dir, split='all', input='unmodified',
                       colorspace='rgb', scale=4, online_degradations=True,
                       online_degradation_params={'device': True, 'noise': True})


def test_qpi_rescale_case_insensitive(tmp_path):
    """A lowercase 'qpi' CSV header must take the fixed (20,40) rescale and
    cutoff path like 'QPI' (keys were already lowercased for lookup)."""
    from sisr_tpu.data.datasets import read_augmentation_list
    import pandas as pd
    names = ['a.png', 'b.png', 'c.png']
    csv = tmp_path / 'meta.csv'
    pd.DataFrame({'image': names, 'qpi': [22, 30, 38]}).set_index('image').to_csv(csv)
    augs, keys = read_augmentation_list(str(csv), filenames=names,
                                        qpi_selection=(25, 35))
    assert keys == ['qpi']
    assert sorted(augs) == ['b.png']  # only qpi=30 is inside (25, 35)
    assert abs(augs['b.png'][0] - 0.5) < 1e-6  # (30-20)/(40-20)


def test_group_tag_regex_ignores_directories(tmp_path):
    """'_q' inside a subdirectory name must not be parsed as a group tag under
    recursive search."""
    sub = tmp_path / 'high_quality'
    sub.mkdir()
    for n in ('x.png', 'y_q20.png'):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(sub / n)
    files = SuperResImages.filter_names(str(tmp_path), recursive=True,
                                        group_select=None)
    assert sorted(files) == [os.path.join('high_quality', 'x.png'),
                             os.path.join('high_quality', 'y.png')]
    only20 = SuperResImages.filter_names(str(tmp_path), recursive=True,
                                         group_select=['20'])
    # untagged files always accept (reference semantics); the tagged file keeps
    # its group and pairs under the stripped base name
    assert sorted(v for vs in only20.values() for v in vs) == [
        os.path.join('high_quality', 'x.png'),
        os.path.join('high_quality', 'y_q20.png')]


def test_disk_decode_cache_sidecar(tmp_path):
    """cache_decoded='sidecar' persists decoded uint8 .npy sidecars: a fresh
    dataset instance (cold process analog) serves identical pixels WITHOUT
    touching the PNG decoder, and editing the source invalidates the sidecar."""
    import time
    lr = tmp_path / 'lr'
    hr = tmp_path / 'hr'
    lr.mkdir()
    hr.mkdir()
    rng = np.random.RandomState(3)
    for i in range(2):
        Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(
            lr / ('im%d.png' % i))
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            hr / ('im%d.png' % i))

    def make():
        return SuperResImages(str(lr), str(hr), split='all', colorspace='rgb',
                              y_only=False, scale=4, cache_decoded='sidecar')

    ds = make()
    first = [np.asarray(ds[i]['lr']) for i in range(2)]
    side_lr = lr / '.decoded_u8'
    assert side_lr.is_dir() and len(list(side_lr.glob('*.npy'))) == 2
    assert (hr / '.decoded_u8').is_dir()

    # cold instance: sidecars serve the pixels; the PNG decoder must not run
    ds2 = make()
    orig = SuperResImages.__dict__['read_image']  # keep the staticmethod wrapper
    try:
        SuperResImages.read_image = staticmethod(
            lambda f: (_ for _ in ()).throw(AssertionError('decoded %s' % f)))
        again = [np.asarray(ds2[i]['lr']) for i in range(2)]
    finally:
        SuperResImages.read_image = orig
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)

    # editing the source invalidates: new pixels, stale sidecar replaced
    new = (np.random.RandomState(9).rand(8, 8, 3) * 255).astype(np.uint8)
    time.sleep(0.01)  # mtime_ns tick
    Image.fromarray(new).save(lr / 'im0.png')
    ds3 = make()
    item = np.asarray(ds3[0]['lr'])
    assert not np.array_equal(item, first[0])
    assert len(list(side_lr.glob('im0.png.*.npy'))) == 1  # stale one cleaned


def test_disk_decode_cache_directory_mode(tmp_path):
    """cache_decoded=<dir> stores hashed sidecars under that directory (for
    read-only data dirs)."""
    lr = tmp_path / 'lr'
    hr = tmp_path / 'hr'
    cache = tmp_path / 'cache'
    lr.mkdir()
    hr.mkdir()
    rng = np.random.RandomState(5)
    Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(lr / 'a.png')
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(hr / 'a.png')
    ds = SuperResImages(str(lr), str(hr), split='all', colorspace='rgb',
                        y_only=False, scale=4, cache_decoded=str(cache))
    ref = np.asarray(ds[0]['lr'])
    files = list(cache.glob('*.npy'))
    assert len(files) == 2  # lr + hr
    assert not (lr / '.decoded_u8').exists()
    ds2 = SuperResImages(str(lr), str(hr), split='all', colorspace='rgb',
                         y_only=False, scale=4, cache_decoded=str(cache))
    np.testing.assert_array_equal(np.asarray(ds2[0]['lr']), ref)


def test_disk_decode_cache_reclaims_crash_leftover_tmp(tmp_path):
    """A tmp sidecar left by a killed mid-write process (old mtime) is reclaimed
    by the next store for the same image; a FRESH tmp (plausibly a live
    concurrent writer) is left alone."""
    import time
    lr = tmp_path / 'lr'
    hr = tmp_path / 'hr'
    lr.mkdir()
    hr.mkdir()
    rng = np.random.RandomState(7)
    Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(lr / 'a.png')
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(hr / 'a.png')

    side = lr / '.decoded_u8'
    side.mkdir()
    stale = side / 'a.png.1.1.npy.tmp999.npy'
    stale.write_bytes(b'partial')
    old = time.time() - 3600
    os.utime(stale, (old, old))
    fresh = side / 'a.png.2.2.npy.tmp998.npy'
    fresh.write_bytes(b'inflight')

    ds = SuperResImages(str(lr), str(hr), split='all', colorspace='rgb',
                        y_only=False, scale=4, cache_decoded='sidecar')
    np.asarray(ds[0]['lr'])  # triggers the store (and its stale hunt)
    assert not stale.exists()
    assert fresh.exists()
    assert len(list(side.glob('a.png.*.npy'))) >= 1  # the real sidecar landed


def test_process_shard_degrades_on_device_indivisible_tail():
    """A ragged tail divisible by the process count but NOT the device mesh must
    degrade to the replicated path — process-sharding it would crash
    shard_batch's global assembly at the end of every epoch."""
    from sisr_tpu.data.loader import DataLoader

    class _DS:
        metadata_keys = []

        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {'lr': np.zeros((4, 4, 3), np.float32)}

    loader = DataLoader(_DS(), batch_size=16, shuffle=False, num_workers=1,
                        process_shard=(0, 2))
    batches = loader._index_batches()
    # conftest pins an 8-device CPU platform: 16 % 8 == 0 -> sharded,
    # tail of 4: 4 % 2 == 0 but 4 % 8 != 0 -> replicated (factor 1, full batch)
    assert [(len(b), f) for b, f in batches] == [(8, 2), (4, 1)]
