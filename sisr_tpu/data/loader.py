"""Threaded, prefetching batch loader + samplers.

Replaces torch ``DataLoader(num_workers=..., pin_memory=True)`` (ref:
Code/SISR/training/data_setup.py:115-123) with a thread-pool loader (PIL/zlib release
the GIL during decode) and an optional device-prefetch wrapper that keeps the next batch
in flight while the current one computes — the host->HBM equivalent of pinned-memory
double buffering.
"""
import random as _random
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class ConcatDataset:
    """Minimal torch-style dataset concatenation."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.cumulative = np.cumsum([len(d) for d in self.datasets]).tolist()
        # surfaces used by downstream code (samplers, metadata keys, degradation mode)
        self.metadata_keys = self.datasets[0].metadata_keys
        key_sets = {tuple(getattr(d, 'metadata_keys', []) or []) for d in self.datasets}
        if len(key_sets) > 1:
            raise RuntimeError(
                'Concatenated training sets carry different metadata layouts %s — '
                'batches straddling the sets would misalign or fail to stack. Give '
                'every set the same degradation_metadata/metadata configuration.'
                % sorted(key_sets))
        modes = {bool(getattr(d, 'device_degradations', False)) for d in self.datasets}
        if len(modes) > 1:
            raise RuntimeError('Cannot mix device-mode and host-mode online '
                               'degradation across concatenated training sets.')
        self.device_degradations = modes.pop()

    def __len__(self):
        return self.cumulative[-1]

    def __getitem__(self, idx):
        for d_idx, bound in enumerate(self.cumulative):
            if idx < bound:
                prev = 0 if d_idx == 0 else self.cumulative[d_idx - 1]
                return self.datasets[d_idx][idx - prev]
        raise IndexError(idx)


class CelebaSplitSampler:
    """Attribute-positive samples first, then negatives (ref: data_handler.py:531-573)."""

    def __init__(self, data_source, selected_attribute='gender', **kwargs):
        self.discriminatory_attribute = selected_attribute
        datasets = data_source.datasets if isinstance(data_source, ConcatDataset) \
            else [data_source]
        self.positive_indices, self.negative_indices = [], []
        offset = 0
        for dataset in datasets:
            p, n, length = self._index_with_attribute(dataset)
            self.positive_indices += [i + offset for i in p]
            self.negative_indices += [i + offset for i in n]
            offset += length
        self.length = offset

    def _index_with_attribute(self, dataset):
        metadata_pos = int(np.where([self.discriminatory_attribute in m
                                     for m in dataset.metadata_keys])[0][0])
        pertinent = [m[metadata_pos] for m in dataset.metadata]
        # sign test rather than ==1/==0: attribute_amplification stores +/-2
        positive = np.where([m > 0 for m in pertinent])[0].tolist()
        negative = np.where([m <= 0 for m in pertinent])[0].tolist()
        return positive, negative, len(dataset.metadata)

    def __iter__(self):
        pos = np.random.choice(self.positive_indices, len(self.positive_indices),
                               replace=False).tolist()
        neg = np.random.choice(self.negative_indices, len(self.negative_indices),
                               replace=False).tolist()
        return iter(pos + neg)

    def __len__(self):
        return self.length


def _collate(items, device_images=False):
    """Stack per-item dicts into batch arrays; strings stay lists; key lists pass
    through.  When request_crops flattens per-item crop stacks into the batch axis,
    per-item companions (metadata, blur_kernels, ...) are repeated per crop so every
    batch entry stays aligned.

    ``device_images`` keeps uniform uint8 lr/hr images as LISTS: the host-side
    np.stack memcpy (~21 ms for a batch of 8 HR 512^2 images on a weak vCPU) is
    skipped and device_prefetch stacks them in HBM instead (see its put())."""
    out = {}
    first = items[0]
    # request_crops items carry (K, h, w, c) image stacks
    crops_per_item = None
    for key in ('lr', 'hr'):
        v = first.get(key)
        if v is not None and np.ndim(v) >= 4:
            crops_per_item = np.asarray(v).shape[0]
            break
    for key in first:
        vals = [item[key] for item in items]
        if key == 'metadata_keys':
            out[key] = first[key]
        elif isinstance(first[key], str):
            # request_crops flattens K crops per item into the batch axis: repeat
            # names per crop so tag/hr_tag stay aligned with the images
            out[key] = [v for v in vals for _ in range(crops_per_item or 1)]
        else:
            arrs = [np.asarray(v) for v in vals]
            if arrs[0].ndim >= 4:  # crop stacks: flatten crops into batch
                out[key] = np.concatenate(arrs, axis=0)
            else:
                if device_images and key in ('lr', 'hr') \
                        and arrs[0].dtype == np.uint8 and arrs[0].ndim == 3:
                    out[key] = arrs  # stacked on device by device_prefetch
                    continue
                try:
                    stacked = np.stack(arrs, axis=0)
                except ValueError:  # ragged (e.g. differently-sized eval images, bs>1)
                    out[key] = arrs
                    continue
                if crops_per_item is not None and stacked.ndim >= 1 \
                        and arrs[0].ndim >= 1:
                    stacked = np.repeat(stacked, crops_per_item, axis=0)
                out[key] = stacked
    return out


class DataLoader:
    """Order-preserving threaded batch loader."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=8,
                 drop_last=False, sampler=None, prefetch_batches=3):
        self.dataset = dataset
        # opt-in: keep uniform uint8 images as lists so device_prefetch stacks
        # them in HBM instead of a host memcpy (fused-eval fast path)
        self.device_collate = False
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers or 1)
        self.drop_last = drop_last
        self.sampler = sampler
        self.prefetch_batches = prefetch_batches

    def _index_batches(self):
        if self.sampler is not None:
            indices = list(iter(self.sampler))
        else:
            indices = list(range(len(self.dataset)))
            if self.shuffle:
                _random.shuffle(indices)
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers <= 1:
            for batch in batches:
                yield _collate([self.dataset[i] for i in batch],
                               device_images=self.device_collate)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            from collections import deque

            def submit(batch):  # per-ITEM futures: all workers decode in parallel
                return [pool.submit(self.dataset.__getitem__, i) for i in batch]

            pending = deque()
            it = iter(batches)
            for _ in range(max(1, self.prefetch_batches)):  # 0 would yield nothing
                b = next(it, None)
                if b is None:
                    break
                pending.append(submit(b))
            while pending:
                futs = pending.popleft()
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
                yield _collate([f.result() for f in futs],
                               device_images=self.device_collate)


def device_prefetch(iterator, size=2, sharding=None):
    """Wrap a host batch iterator so upcoming batches are already on device.

    Transfers the numeric entries of the batch dict with ``jax.device_put`` (optionally
    with a ``Sharding`` for multi-chip data parallelism), staged ``size`` batches
    ahead in a BACKGROUND thread: on remote-attached devices the device_put RPC
    serializes the batch bytes on the calling thread, so inline transfers would
    block step dispatch — the dedicated uploader overlaps them with device compute.
    """
    import jax
    import queue as queue_mod
    import threading

    import jax.numpy as jnp

    def _uniform_list(v):
        return (isinstance(v, list) and v and isinstance(v[0], np.ndarray)
                and all(isinstance(a, np.ndarray) and a.shape == v[0].shape
                        and a.dtype == v[0].dtype for a in v))

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1:
                out[k] = jax.device_put(v, sharding) if sharding is not None \
                    else jax.device_put(v)
            elif _uniform_list(v):
                # device-side stacking (DataLoader.device_collate): images upload
                # individually (async, zero host memcpy) and stack in HBM — the
                # host np.stack alternative costs a full batch memcpy on the
                # loader's critical path.  Ragged lists fail the uniformity check
                # and pass through to the per-image eval fallback unchanged.
                if sharding is not None:
                    out[k] = jax.device_put(np.stack(v, axis=0), sharding)
                else:
                    out[k] = jnp.stack([jax.device_put(a) for a in v])
            else:
                out[k] = v
        return out

    q = queue_mod.Queue(maxsize=max(1, size))
    end = object()
    abandoned = threading.Event()  # consumer dropped the generator early

    def _put(item):
        # bounded put that gives up if the consumer is gone — otherwise an
        # abandoned generator (exception/Ctrl-C mid-epoch) would leave this
        # thread blocked forever holding device-resident batches
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.5)
                return
            except queue_mod.Full:
                continue

    def uploader():
        try:
            for b in iterator:
                _put(put(b))
                if abandoned.is_set():
                    return
            _put(end)
        except BaseException as exc:  # surfaced on the consumer thread below
            _put(exc)

    threading.Thread(target=uploader, daemon=True,
                     name='sisr-device-prefetch').start()
    try:
        yield from _drain(q, end)
    finally:
        abandoned.set()
        while not q.empty():  # release any staged device batches
            try:
                q.get_nowait()
            except queue_mod.Empty:
                break


def _drain(q, end):
    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
