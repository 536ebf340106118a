"""Threaded, prefetching batch loader + samplers.

Replaces torch ``DataLoader(num_workers=..., pin_memory=True)`` (ref:
Code/SISR/training/data_setup.py:115-123) with a thread-pool loader (PIL/zlib release
the GIL during decode) and an optional device-prefetch wrapper that keeps the next batch
in flight while the current one computes — the host->HBM equivalent of pinned-memory
double buffering.
"""
import random as _random
import threading as _threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# Diagnostic probe: items this process actually loaded (dataset.__getitem__ calls
# issued by any DataLoader).  test_multiprocess asserts each rank's loader touched
# only its 1/process_count shard of the training data.  Incremented under a lock:
# _finish runs on prefetch/uploader threads, and a bare += would lose counts in
# exactly the threaded configurations the probe is meant to diagnose.
ITEMS_LOADED = 0
_ITEMS_LOADED_LOCK = _threading.Lock()


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
        # dedicated RNG (seeded from the global stream once, identical across
        # ranks): epoch orders must not depend on per-item RNG consumption —
        # see DataLoader._shuffle_rng
        self._rng = np.random.RandomState(np.random.randint(0, 2 ** 31))

    def _index_with_attribute(self, dataset):
        metadata_pos = int(np.where([self.discriminatory_attribute in m
                                     for m in dataset.metadata_keys])[0][0])
        pertinent = [m[metadata_pos] for m in dataset.metadata]
        # sign test rather than ==1/==0: attribute_amplification stores +/-2
        positive = np.where([m > 0 for m in pertinent])[0].tolist()
        negative = np.where([m <= 0 for m in pertinent])[0].tolist()
        return positive, negative, len(dataset.metadata)

    def __iter__(self):
        pos = self._rng.choice(self.positive_indices, len(self.positive_indices),
                               replace=False).tolist()
        neg = self._rng.choice(self.negative_indices, len(self.negative_indices),
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
                 drop_last=False, sampler=None, prefetch_batches=3,
                 process_shard=None):
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
        # multihost input sharding: (rank, process_count).  Every rank builds the
        # SAME global batch index order (the seed is global), but loads only its
        # contiguous 1/count slice of each batch; MeshContext.shard_batch then
        # assembles the global device array from the process-local shards
        # (jax.make_array_from_process_local_data) — no rank decodes data another
        # host consumes.  Contiguity matters: the (dcn, data) mesh is host-major
        # on its leading axis, so global batch positions [r*B/count, (r+1)*B/count)
        # are exactly rank r's addressable shards.  Per-item augmentation draws
        # (crops/flips/online kernels) come from each rank's own RNG stream, so
        # crop POSITIONS differ from a single-process run (statistically
        # equivalent); global batch MEMBERSHIP is identical because shuffling uses
        # the dedicated RNG below, insulated from per-item consumption.
        self.process_shard = tuple(process_shard) if process_shard else None
        # Dedicated shuffle RNG, seeded from the global stream ONCE at
        # construction (identical on every rank — construction precedes any
        # divergent per-item loading).  Epoch shuffles must not depend on how many
        # global-RNG draws item loading consumed: under process sharding ranks
        # load different items, and threaded decode already makes the global
        # stream's draw order racy.
        self._shuffle_rng = _random.Random(_random.getrandbits(64))

    def _index_batches(self):
        """Global batch index lists, each paired with this process's slice and the
        shard factor (1 = load the whole batch; N = load a 1/N contiguous slice)."""
        if self.sampler is not None:
            indices = list(iter(self.sampler))
        else:
            indices = list(range(len(self.dataset)))
            if self.shuffle:
                self._shuffle_rng.shuffle(indices)
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if not self.process_shard:
            return [(b, 1) for b in batches]
        rank, count = self.process_shard
        # sharded assembly (make_array_from_process_local_data) requires the GLOBAL
        # batch to divide the device mesh, not just the process count — a ragged
        # tail divisible by 2 processes but not 8 devices must degrade here, or
        # shard_batch raises at the end of every epoch
        try:
            import jax
            n_devices = jax.device_count()
        except Exception:
            n_devices = count
        out = []
        for b in batches:
            if count > 1 and len(b) % count == 0 and len(b) % n_devices == 0:
                per = len(b) // count
                out.append((b[rank * per:(rank + 1) * per], count))
            else:
                # a batch that doesn't divide the process count or the device mesh
                # (the ragged tail) degrades to the replicated path: every rank
                # loads it whole, the device put replicates/shards it (same rule
                # as shard_batch's divisibility fallback)
                out.append((b, 1))
        return out

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _finish(self, items, factor):
        global ITEMS_LOADED
        with _ITEMS_LOADED_LOCK:
            ITEMS_LOADED += len(items)
        out = _collate(items, device_images=self.device_collate)
        if factor > 1:
            out['_shard_factor'] = factor
        return out

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers <= 1:
            for batch, factor in batches:
                yield self._finish([self.dataset[i] for i in batch], factor)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            from collections import deque

            def submit(batch):  # per-ITEM futures: all workers decode in parallel
                return [pool.submit(self.dataset.__getitem__, i) for i in batch]

            pending = deque()
            it = iter(batches)
            for _ in range(max(1, self.prefetch_batches)):  # 0 would yield nothing
                nxt = next(it, None)
                if nxt is None:
                    break
                pending.append((submit(nxt[0]), nxt[1]))
            while pending:
                futs, factor = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append((submit(nxt[0]), nxt[1]))
                yield self._finish([f.result() for f in futs], factor)


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
