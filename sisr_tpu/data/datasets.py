"""SuperResImages dataset: host-side index building + per-item loading.

Faithful port of the reference's single do-everything dataset
(ref: Code/sr_tools/data_handler.py:20-528) producing H,W,C float32 numpy arrays
(channel-last — the framework's TPU-native layout) instead of torch CHW tensors:

* image discovery with `_qN` group-tag filtering, recursive search;
* split selection (hardcoded dataset splits / custom ranges / shortlist files);
* blacklist removal; degradation-metadata CSV parsing (JSON-list columns, QPI
  normalization to the fixed (20,40) range); CelebA attribute merging;
* online degradation mode (random gaussian blur + PCA code + bicubic downscale);
* optional matched random crops / flip-rotate augments, YCbCr conversion.
"""
from collections import OrderedDict, deque
import copy
import json
import os
import re
from itertools import compress

import numpy as np
import pandas as pd
import PIL.Image

from ..configuration.constants import data_splits
from ..utils.helpers import extract_image_names_from_folder
from ..native import decode_png_rgb8 as native_decode_png
from ..ops.colorspace import RGBtoYCbCrConverter
from ..ops import degradations as g_utils
from ..ops.transforms import (center_crop_np, downsample, pil_to_float, float_to_pil,
                              random_flip_rotate, random_matched_crop)


def read_celeba_attributes(attributes_loc, image_dict, selected_metadata='all',
                           attribute_amplification=None):
    """(ref: data_handler.py:20-58)"""
    full_dict = image_dict.copy()
    celeb_data = pd.read_csv(attributes_loc, skiprows=1, sep=r'\s+')

    if attribute_amplification is not None:
        celeb_data[celeb_data < 0] = -2
        celeb_data[celeb_data > 0] = 2
    else:
        celeb_data[celeb_data < 0] = 0

    if selected_metadata != 'all':
        if 'age' in selected_metadata:
            celeb_data.rename(columns={'Young': 'age'}, inplace=True)
        if 'gender' in selected_metadata:
            celeb_data.rename(columns={'Male': 'gender'}, inplace=True)
        celeb_data = celeb_data[selected_metadata]

    final_keys = list(celeb_data.columns)
    final_keys.reverse()
    for key in sorted(full_dict):
        added_data = [celeb_data.loc[key.split('_')[0].split('.')[0] + '.jpg'][data_key]
                      for data_key in final_keys]
        full_dict[key] = np.concatenate((added_data, full_dict[key]))
    return full_dict, final_keys


def read_augmentation_list(metadata_file, filenames=None, normalize=True,
                           legacy_blur_kernels=None, data_attributes=None,
                           attributes_loc=None, attribute_amplification=None,
                           force_qpi_range=True, qpi_selection=None):
    """Degradation-metadata CSV parser (ref: data_handler.py:62-144)."""
    keys = deque()
    qpi_cutoffs = bool(qpi_selection) and None not in qpi_selection

    if metadata_file is not None:
        aug_data = pd.read_csv(metadata_file, header=0, index_col=0)
        for col in aug_data:
            if pd.api.types.is_object_dtype(aug_data[col]) \
                    or pd.api.types.is_string_dtype(aug_data[col]):
                aug_data[col] = aug_data[col].apply(json.loads)
                keys.extend([col.lower()] * len(aug_data[col].iloc[0]))
            elif pd.api.types.is_integer_dtype(aug_data[col]) \
                    or pd.api.types.is_float_dtype(aug_data[col]):
                # floats take the same normalization path as ints (the reference only
                # handled int columns and errored on floats; a '23.0'-style QPI column
                # must not silently skip the (20,40) rescale)
                aug_data[col] = aug_data[col].astype(float)
                keys.append(col.lower())
                minimum = 20 if (col.upper() == 'QPI' and force_qpi_range) \
                    else aug_data[col].min()
                maximum = 40 if (col.upper() == 'QPI' and force_qpi_range) \
                    else aug_data[col].max()
                if normalize and maximum != minimum:
                    aug_data[col] = (aug_data[col] - minimum) / (maximum - minimum)
                    if col.upper() == 'QPI' and qpi_cutoffs:
                        qpi_selection = [(q - minimum) / (maximum - minimum)
                                         for q in qpi_selection]
                elif normalize:
                    # constant column: (x-min)/(max-min) is 0/0 -> NaN would poison
                    # the model's metadata input; a constant carries no information,
                    # so pin it to 0 (the reference crashes the same way on constant
                    # int columns — this guard covers both)
                    aug_data[col] = 0.0
                    if col.upper() == 'QPI' and qpi_cutoffs:
                        # shift cutoffs into the same space so range checks still hold
                        qpi_selection = [q - minimum for q in qpi_selection]
            else:
                raise RuntimeError('Unidentified datatype in metadata file.')

        all_image_dict = aug_data.T.to_dict('list')
        augmentation_dict = {}
        for key in filenames:
            data = []
            for v in all_image_dict[key]:
                if type(v) == list:
                    data.extend(v)
                else:
                    data.append(v)
            augmentation_dict[key] = np.array(data)
    else:
        augmentation_dict = {image: np.array([]) for image in filenames}

    if attributes_loc is not None and data_attributes is not None:
        augmentation_dict, attribute_keys = read_celeba_attributes(
            attributes_loc, augmentation_dict, selected_metadata=data_attributes,
            attribute_amplification=attribute_amplification)
        keys.extendleft(reversed(attribute_keys))

    if legacy_blur_kernels is not None:
        kernels = np.load(legacy_blur_kernels)
        keys.extendleft(['blur_kernel'] * len(kernels[0]))
        for index, key in enumerate(sorted(augmentation_dict)):
            augmentation_dict[key] = np.concatenate((kernels[index],
                                                     augmentation_dict[key]))

    if qpi_cutoffs:
        qpi_pos = list(keys).index('qpi')
        accepted = [im for im, md in augmentation_dict.items()
                    if qpi_selection[0] <= md[qpi_pos] <= qpi_selection[-1]]
        augmentation_dict = {im: augmentation_dict[im] for im in accepted}

    return augmentation_dict, list(keys)


class SuperResImages:
    """(ref: data_handler.py:147-528).  Indexable dataset yielding per-image dicts."""

    def __init__(self, lr_dir=None, hr_dir=None, dataset=None, split=None,
                 custom_split=None, recursive_search=False, image_shortlist=None,
                 input='interp', colorspace='ycbcr', y_only=True, conv_type='jpg',
                 scale=4, mask_data=None, group_select=None,
                 attribute_amplification=None, halfway_data=None, blacklist=None,
                 degradation_metadata_file=None, qpi_selection=None,
                 data_attributes=None, metadata=None, legacy_blur_kernels=None,
                 qpi_sort=False, random_augments=None, random_crop=None,
                 online_degradations=None, online_degradation_params=None,
                 request_crops=None, usage=None, cache_decoded=None, **kwargs):

        if split not in ['train', 'eval', 'test', 'all', None]:
            raise RuntimeError('"Split" must be one of: train | eval | test | all | None')
        if input not in ['interp', 'unmodified']:
            raise RuntimeError('"lr_type" must be one of: interp | unmodified')

        self.split = split
        self.scale = scale
        self.lr_type = input
        self.patch_crop = random_crop
        self.random_augment = random_augments
        self.request_crops = request_crops
        self.metadata_keys = []
        if group_select is not None and type(group_select) != list:
            group_select = [group_select]
        self.online_degradations = online_degradations

        self.hr_base = hr_dir
        self.mask_base = mask_data
        self.halfway_base = halfway_data

        self.device_degradations = bool(online_degradations
                                        and (online_degradation_params or {})
                                        .get('device'))
        if self.device_degradations and (usage or split) in ('eval', 'test'):
            raise RuntimeError('device-mode online degradation emits placeholder LR '
                               'images (LR is synthesized inside the train step) — '
                               'use host-mode online degradation or file-based LR for '
                               'eval sets.')
        if online_degradation_params:
            online_degradation_params = {k: v for k, v in
                                         online_degradation_params.items()
                                         if k != 'device'} or None
        if not online_degradations:
            main_dir = lr_dir
            self.lr_base = lr_dir
        else:
            if hr_dir is None:
                raise RuntimeError('Cannot synthesize LR images without HR images.')
            main_dir = hr_dir
            self.lr_base = None
            self.lr_filenames = None
            # 30k random kernels -> PCA(10) (ref: data_handler.py:221-238)
            batch_ker = g_utils.random_batch_kernel(batch=30000)
            pca_matrix = g_utils.pca_matrix(batch_ker.reshape(30000, -1), k=10)
            if online_degradation_params is None:
                self.degrader = g_utils.OnlineDegrader(pca_matrix, random=True, kernel=21,
                                                       rate_iso=1.0, sig_min=0.2,
                                                       sig_max=4.0, noise=False,
                                                       noise_high=0.0)
            else:
                self.degrader = g_utils.OnlineDegrader(pca_matrix, random=True,
                                                       **online_degradation_params)

        main_filenames = self.filter_names(main_dir, recursive_search, group_select)
        main_filenames = self.dataset_split(main_filenames, custom_split, image_shortlist,
                                            split, dataset, main_dir)
        main_filenames = self.blacklist_removal(main_filenames, blacklist)

        if not online_degradations:
            main_list, base_list = [], []
            for key, val in main_filenames.items():
                for file_name in val:
                    main_list.append(file_name)
                    base_list.append(key)
            self.lr_filenames = main_list
            if len(main_filenames) == 0:
                raise RuntimeError('No images were supplied or all images were '
                                   'filtered out!')
            self.base_filenames = base_list
        else:
            self.base_filenames = list(main_filenames.keys())

        if degradation_metadata_file is not None or metadata is not None:
            meta_names = self.base_filenames if online_degradations else self.lr_filenames
            att_dict, meta_keys = read_augmentation_list(
                degradation_metadata_file, attributes_loc=data_attributes,
                data_attributes=metadata, qpi_selection=qpi_selection,
                attribute_amplification=attribute_amplification, filenames=meta_names,
                legacy_blur_kernels=legacy_blur_kernels)
            self.metadata_keys = meta_keys
            if qpi_selection is not None:
                if online_degradations:
                    # the QPI filter drops images from att_dict: keep the base list
                    # in sync (the non-online branch below re-filters lr/base pairs)
                    self.base_filenames = [b for b in self.base_filenames
                                           if b in att_dict]
                    meta_names = self.base_filenames
                else:
                    pairs = [(lr, base) for lr, base in zip(self.lr_filenames,
                                                            self.base_filenames)
                             if lr in att_dict]
                    if not pairs:
                        raise RuntimeError(
                            'qpi_selection %s filtered out every image.'
                            % (qpi_selection,))
                    self.lr_filenames, self.base_filenames = map(list, zip(*pairs))
                    meta_names = self.lr_filenames
                if not meta_names:
                    raise RuntimeError('qpi_selection %s filtered out every image.'
                                       % (qpi_selection,))
            metadata_list = [att_dict[image] for image in meta_names]

            if qpi_sort and not online_degradations:
                qpi_vals = [m[meta_keys.index('qpi')] for m in metadata_list]
                sorted_data = sorted(zip(self.lr_filenames, self.base_filenames,
                                         metadata_list, qpi_vals),
                                     key=lambda vals: vals[-1])
                self.lr_filenames, self.base_filenames, self.metadata, _ = \
                    map(list, zip(*sorted_data))
            else:
                self.metadata = metadata_list
        else:
            self.metadata = None

        self.image_count = len(self.lr_filenames) if not online_degradations \
            else len(self.base_filenames)

        if online_degradations:
            if len(self.metadata_keys) == 0:
                self.metadata_keys = ['blur_kernel'] * self.degrader.para_in
            else:
                self.metadata_keys.extend(['blur_kernel'] * self.degrader.para_in)
            if self.degrader.noise:
                if self.device_degradations:
                    raise ValueError(
                        'device-mode online degradation does not apply gaussian '
                        "noise (the jitted pipeline is blur + downscale only) — set "
                        "noise = false in online_degradation_params, or use "
                        'host-mode degradation.')
                # the degrader emits para_in + 1 code entries when noise is on
                # (kernel code + noise level); the reference never registers the
                # extra key (data_handler.py:295-297) so the noise conditioning was
                # silently dropped by the key mask — fixed, not ported
                self.metadata_keys.append('noise')

        self.colorspace = colorspace
        self.y_only = y_only
        self.conv_type = conv_type
        self._ycbcr = RGBtoYCbCrConverter(y_only=y_only, im_type=conv_type) \
            if colorspace == 'ycbcr' else None
        # opt-in (fused device eval): serve lr/hr as decoded uint8, skipping the host
        # float conversion — consumers divide by 255 on device.  rgb-only.
        self.keep_uint8 = False
        # opt-in decoded-image cache (data config `cache_decoded = true` or a byte
        # cap): training epochs re-decode every PNG on the host, which dominates
        # epoch wall-clock once the device step is a few ms — cache the decoded
        # uint8 arrays after the first epoch.  True => 4 GiB cap.
        # A STRING value additionally persists decoded uint8 `.npy` sidecars to
        # disk so COLD runs (new processes) skip PNG decode entirely: 'sidecar'
        # stores them in a `.decoded_u8/` dir next to each image, any other string
        # is a cache directory (hashed names).  Measured on this host: np.load of
        # a 512^2 sidecar is 71x faster than the PNG decode (0.27 vs 19 ms) — the
        # ~47 img/s decode ceiling the uncached eval protocol sits under.
        # Sidecar names embed (mtime_ns, size); stale ones are ignored + cleaned.
        import threading
        self._decode_cache = {} if cache_decoded else None
        self._decode_cache_bytes = 0
        self._decode_cache_lock = threading.Lock()
        self._decode_cache_cap = (cache_decoded if isinstance(cache_decoded, int)
                                  and cache_decoded > 1 else 4 << 30)
        self._disk_cache_dir = None
        # per-directory cached listings for sidecar stale-cleanup (dir -> set of
        # names, maintained incrementally under _decode_cache_lock): a fresh
        # os.listdir per STORE would make cold population of a shared cache dir
        # O(N^2) directory scans
        self._sidecar_listing = {}
        if isinstance(cache_decoded, str):
            self._disk_cache_dir = 'sidecar' if cache_decoded == 'sidecar' \
                else os.path.abspath(os.path.expanduser(cache_decoded))

        print('Initialized %s data with %d image%s.' % (
            dataset if dataset is not None else 'image', self.image_count,
            's' if self.image_count > 1 else ''))

    # --- index building (ref: data_handler.py:307-390) ------------------------------------
    @staticmethod
    def filter_names(directory, recursive, group_select):
        final_files = OrderedDict()
        raw_filenames = extract_image_names_from_folder(directory, recursive=recursive)
        for file in raw_filenames:
            real_file = os.path.relpath(file, directory)
            # the _qN group tag lives in the FILENAME: match on the basename only,
            # so recursive subdirectory names containing '_q' (e.g. high_quality/)
            # can't be misread as group tags and dropped/mispaired
            subdir, fname = os.path.split(real_file)
            split_key = re.split(r"_q(.*)(?=\.)", fname)
            if len(split_key) > 1:
                if group_select is None or split_key[1] in group_select:
                    accept = True
                    base_name = os.path.join(subdir, split_key[0] + split_key[2])
                else:
                    accept, base_name = False, ''
            else:
                base_name = os.path.join(subdir, split_key[0])
                accept = True
            if accept:
                final_files.setdefault(base_name, []).append(real_file)
        return final_files

    @staticmethod
    def dataset_split(current_files, custom_split, image_shortlist, split, dataset,
                      main_dir):
        if custom_split is not None or (image_shortlist is None
                                        and split not in ('all', None)
                                        and len(current_files) != 1):
            if custom_split is None:
                start, end = data_splits[dataset][split]
            else:
                start, end = custom_split[0], custom_split[1]
            return OrderedDict(list(current_files.items())[start:end])
        elif image_shortlist is not None:
            with open(image_shortlist, 'r') as shortlist:
                cleanup = lambda pth: os.path.relpath(pth.rstrip('\n'), main_dir) \
                    if main_dir in pth else pth.rstrip('\n')
                accepted = [cleanup(line) for line in shortlist]
            return OrderedDict((k, v) for k, v in current_files.items() if k in accepted)
        return current_files

    @staticmethod
    def blacklist_removal(current_files, blacklist):
        filtered = copy.copy(current_files)
        if blacklist is not None:
            print('Removing blacklisted images.')
            for b in pd.read_csv(blacklist, header=[0])['Images'].tolist():
                if b in filtered:
                    del filtered[b]
        return filtered

    @staticmethod
    def read_image(filename):
        """Decode to an H,W,3 uint8 RGB numpy array (native libpng for PNG — lossless,
        identical pixels to PIL — with PIL fallback for exotic formats).  numpy is the
        pipeline's working representation: the old decode->PIL->numpy round trip cost
        two full-image copies per read on the loader's hot path."""
        if filename.lower().endswith('.png'):
            arr = native_decode_png(filename)
            if arr is not None:
                return arr
        im = PIL.Image.open(filename)
        if im.mode != 'RGB':
            im = im.convert('RGB')
        return np.asarray(im, np.uint8)

    def _sidecar_path(self, filename):
        """Persisted-decode sidecar location for ``filename``: name embeds
        (mtime_ns, size) so edits to the source invalidate it implicitly."""
        st = os.stat(filename)
        stem = '%s.%d.%d.npy' % (os.path.basename(filename), st.st_mtime_ns,
                                 st.st_size)
        if self._disk_cache_dir == 'sidecar':
            return os.path.join(os.path.dirname(os.path.abspath(filename)),
                                '.decoded_u8', stem)
        import hashlib
        h = hashlib.sha1(os.path.abspath(filename).encode()).hexdigest()[:16]
        return os.path.join(self._disk_cache_dir, '%s_%s' % (h, stem))

    def _disk_cache_load(self, filename):
        try:
            path = self._sidecar_path(filename)
            if os.path.isfile(path):
                arr = np.load(path)
                if arr.dtype == np.uint8 and arr.ndim == 3:
                    return arr
        except Exception:
            pass
        return None

    def _disk_cache_store(self, filename, arr):
        """Best-effort atomic sidecar write; a read-only data dir disables the
        disk layer for this dataset (one notice, decode continues unaffected)."""
        import time as _time
        try:
            path = self._sidecar_path(filename)
            d = os.path.dirname(path)
            os.makedirs(d, exist_ok=True)
            base = os.path.basename(path)
            with self._decode_cache_lock:
                names = self._sidecar_listing.get(d)
                if names is None:  # one listdir per directory, then incremental
                    names = self._sidecar_listing[d] = set(os.listdir(d))
                listing_snapshot = list(names)
            # drop stale sidecars of the same source (old mtime/size), and reclaim
            # crash-leftover tmp files old enough that no live writer owns them
            prefix = base.rsplit('.', 3)[0] + '.'
            for old in listing_snapshot:
                if old == base or not old.startswith(prefix):
                    continue
                full = os.path.join(d, old)
                if '.tmp' in old:
                    try:
                        if _time.time() - os.stat(full).st_mtime < 600:
                            continue  # plausibly a live concurrent writer
                    except OSError:
                        pass  # already gone: fall through to the discard
                elif not old.endswith('.npy'):
                    continue
                try:
                    os.remove(full)
                except OSError:
                    pass
                with self._decode_cache_lock:
                    names.discard(old)
            tmp = '%s.tmp%d.npy' % (path, os.getpid())
            with open(tmp, 'wb') as f:
                np.save(f, arr)
            os.replace(tmp, path)
            with self._decode_cache_lock:
                names.add(base)
        except OSError as exc:
            print('decoded-image disk cache disabled (%s): %s'
                  % (self._disk_cache_dir, exc))
            self._disk_cache_dir = None

    def _read_cached(self, filename):
        """read_image through the opt-in decoded-uint8 cache (thread-safe enough:
        dict assignment is atomic; a concurrent miss costs one duplicate decode).
        Returned arrays are treated as read-only by the pipeline (crops/flips are
        views; float conversions copy)."""
        cache = self._decode_cache
        if cache is None:
            return self.read_image(filename)
        arr = cache.get(filename)
        if arr is None:
            from_disk = False
            if self._disk_cache_dir is not None:
                arr = self._disk_cache_load(filename)
                from_disk = arr is not None
            if arr is None:
                arr = self.read_image(filename)
            if self._disk_cache_dir is not None and not from_disk:
                self._disk_cache_store(filename, arr)
            with self._decode_cache_lock:  # loader threads race on the byte budget
                if self._decode_cache_bytes + arr.nbytes <= self._decode_cache_cap:
                    cache[filename] = arr
                    self._decode_cache_bytes += arr.nbytes
        return arr

    def _to_model_space(self, arr):
        """float HWC RGB -> requested colorspace."""
        if self._ycbcr is not None:
            return self._ycbcr(arr)
        return arr

    def __getitem__(self, index):
        """(ref: data_handler.py:433-525)"""
        to_image = pil_to_float
        # device-mode online degradation composes with u8 transport (only the HR crop
        # travels; blur + downscale run on device) — host-mode blurring needs floats
        if self.keep_uint8 and self._ycbcr is None \
                and (not self.online_degradations or self.device_degradations):
            to_image = lambda pil: np.atleast_3d(np.asarray(pil, np.uint8))
        base_name = self.base_filenames[index]
        hr_im = None
        mask_im = np.array(0)
        if self.hr_base is not None:
            hr_arr = self._read_cached(os.path.join(self.hr_base, base_name))
        else:
            hr_arr = None

        unreduced_kernel = np.array(0)
        if self.online_degradations:
            image_name = base_name
            if self.device_degradations:
                # device mode: emit only the kernel (+ a placeholder LR for shape/crop
                # bookkeeping); blur + bicubic downscale run inside the jitted train
                # step (ops/degradations.degrade_batch_on_device via the handler)
                kernels = self.degrader.kernel_gen(self.degrader.random, 1)
                kernel_map = self.degrader.encoder(kernels)[0]
                unreduced_kernel = kernels[0].astype(np.float32)
                ch = (hr_arr.shape[0] // self.scale) * self.scale
                cw = (hr_arr.shape[1] // self.scale) * self.scale
                lr_im = np.zeros((ch // self.scale, cw // self.scale, 3), np.float32)
            else:
                blurred, kernel_map, unreduced_kernel = self.degrader(
                    pil_to_float(hr_arr))
                _, lr_pil = downsample(float_to_pil(blurred), scale=self.scale, jm=False)
                lr_im = pil_to_float(lr_pil)
            if self.metadata is not None:
                metadata = np.concatenate((self.metadata[index], kernel_map))
            else:
                metadata = kernel_map
        else:
            image_name = self.lr_filenames[index]
            lr_im = to_image(self._read_cached(os.path.join(self.lr_base, image_name)))
            if self.metadata is not None:
                metadata = self.metadata[index]
            else:
                metadata = np.array(0)
            if self.metadata is not None and 'unmodified_blur_kernel' in self.metadata_keys:
                kernel_loc = [m == 'unmodified_blur_kernel' for m in self.metadata_keys]
                unreduced = list(compress(self.metadata[index], kernel_loc))
                klen = int(np.sqrt(len(unreduced)))
                unreduced_kernel = np.array(unreduced).reshape(klen, klen)

        # HR alignment crop (ref: data_handler.py:471-489)
        if hr_arr is not None:
            if self.lr_type == 'interp':
                h, w = lr_im.shape[0], lr_im.shape[1]
            else:
                h, w = lr_im.shape[0] * self.scale, lr_im.shape[1] * self.scale
            if hr_arr.shape[1] != w or hr_arr.shape[0] != h:
                hr_arr = center_crop_np(hr_arr, height=h, width=w)
            hr_im = self._to_model_space(to_image(hr_arr))
            if self.mask_base is not None:
                mask_arr = self._read_cached(os.path.join(self.mask_base, base_name))
                if mask_arr.shape[1] != w or mask_arr.shape[0] != h:
                    mask_arr = center_crop_np(mask_arr, height=h, width=w)
                mask_im = np.asarray(mask_arr)
        else:
            hr_im = np.array(0)

        if self.halfway_base is not None:
            halfway_im = self._to_model_space(pil_to_float(
                self._read_cached(os.path.join(self.halfway_base, base_name))))
        else:
            halfway_im = np.array(0)

        lr_im = self._to_model_space(lr_im)

        if self.random_augment is not None:
            lr_im, hr_im = random_flip_rotate(lr_im, hr_im)

        if self.patch_crop is not None:
            # interp-input models carry an HR-sized LR: patches align 1:1 (scale 1)
            crop_scale = 1 if self.lr_type == 'interp' else self.scale
            if self.request_crops is not None:
                images = [random_matched_crop(lr_im, hr_im, crop_size=self.patch_crop,
                                              scale=crop_scale)
                          for _ in range(self.request_crops)]
                lr_ims, hr_ims = zip(*images)
                lr_im = np.stack(lr_ims, 0)
                hr_im = np.stack(hr_ims, 0)
            else:
                lr_im, hr_im = random_matched_crop(lr_im, hr_im,
                                                   crop_size=self.patch_crop,
                                                   scale=crop_scale)

        return {'lr': lr_im,
                'hr': hr_im,
                'tag': image_name,
                'hr_tag': base_name,
                'mask': mask_im,
                'halfway_data': halfway_im,
                'metadata': np.asarray(metadata, dtype=np.float32),
                'metadata_keys': self.metadata_keys,
                'blur_kernels': unreduced_kernel}

    def __len__(self):
        return self.image_count
