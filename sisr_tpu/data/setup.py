"""sisr_data_setup: build train/eval loaders from TOML data tables
(ref: Code/SISR/training/data_setup.py:9-125)."""
import os

from .datasets import SuperResImages
from .loader import ConcatDataset, CelebaSplitSampler, DataLoader


def sisr_data_setup(training_sets, eval_sets, batch_size=16, eval_batch_size=1,
                    dataloader_threads=8, drop_last_training_batch=False,
                    extract_masks=False, rep_partition=None, attributes=None,
                    blacklists=None, sampler_attributes=None, **kwargs):
    """Prepare SR train/eval data loaders (parameter semantics per the reference)."""

    def setup_data(data_set, split):
        usage = split  # 'train'/'eval' before any split rewriting below
        mask_loc = os.path.join(data_set['hr'], 'segmentation_patterns') \
            if extract_masks else None

        custom_range = None
        if data_set['cutoff'] is not None:
            if type(data_set['cutoff']) == list:
                custom_range = data_set['cutoff']
            else:
                custom_range = (0, data_set['cutoff'])
        elif data_set['name'] is None:
            split = 'all'

        if data_set['qpi_values'] is not None:  # legacy alias
            data_set['degradation_metadata'] = data_set['qpi_values']

        if data_set['degradation_metadata'] == 'on_site':
            data_set['degradation_metadata'] = os.path.join(data_set['lr'],
                                                            'degradation_metadata.csv')
            if not os.path.isfile(data_set['degradation_metadata']):
                data_set['degradation_metadata'] = os.path.join(data_set['lr'],
                                                                'qpi_slices.csv')

        blacklist = blacklists[data_set['name']] \
            if blacklists is not None and data_set['name'] in blacklists else None
        data_attributes = attributes[data_set['name']] \
            if attributes is not None and data_set['name'] is not None else None

        return SuperResImages(
            lr_dir=data_set['lr'], hr_dir=data_set['hr'], blacklist=blacklist,
            data_attributes=data_attributes, image_shortlist=data_set['image_shortlist'],
            metadata=data_set['metadata'],
            attribute_amplification=data_set['attribute_amplification'],
            dataset=data_set['name'], split=split,
            y_only=False if split == 'eval' else True, custom_split=custom_range,
            degradation_metadata_file=data_set['degradation_metadata'],
            legacy_blur_kernels=data_set['legacy_blur_kernels'],
            random_crop=data_set['crop'], random_augments=data_set['random_augment'],
            recursive_search=data_set['recursive_search'] or False,
            mask_data=mask_loc, online_degradations=data_set['online_degradations'],
            request_crops=data_set['request_crops'],
            online_degradation_params=data_set['online_degradation_params'],
            cache_decoded=data_set['cache_decoded'],
            usage=usage, **kwargs)

    all_train_data, all_val_data = [], []
    print('---------------')
    print('preparing training data:')
    for key, train_set in training_sets.items():
        all_train_data.append(setup_data(train_set, split='train'))
    print('---------------')
    print('preparing validation data:')
    for key, eval_set in eval_sets.items():
        all_val_data.append(setup_data(eval_set, split='eval'))
    print('---------------')

    all_train_data = all_train_data[0] if len(all_train_data) == 1 \
        else ConcatDataset(all_train_data)
    all_val_data = all_val_data[0] if len(all_val_data) == 1 \
        else ConcatDataset(all_val_data)

    if sampler_attributes is None:
        sampler = None
    elif sampler_attributes['name'].lower() == 'celebasplitsampler':
        sampler = CelebaSplitSampler(all_train_data, **sampler_attributes)
    else:
        raise RuntimeError('Selected data sampler not recognized.')

    # multihost input sharding: on a multi-process launch each rank decodes only
    # its 1/process_count slice of every global training batch (the global batch
    # composition — seeded shuffle over the same index space — is identical on
    # every rank, so the assembled global arrays match a single-process run
    # bit-for-bit).  Validation stays replicated: eval batches default to size 1
    # and the per-epoch val set is small; rank-0 gating covers the writes.
    process_shard = None
    try:
        import jax
        if jax.process_count() > 1:
            process_shard = (jax.process_index(), jax.process_count())
    except Exception:
        pass

    train_dataloader = DataLoader(dataset=all_train_data, batch_size=batch_size,
                                  shuffle=sampler is None,
                                  num_workers=8 if dataloader_threads is None else dataloader_threads,
                                  drop_last=bool(drop_last_training_batch),
                                  sampler=sampler,
                                  process_shard=process_shard)
    val_dataloader = DataLoader(dataset=all_val_data, batch_size=eval_batch_size)
    return train_dataloader, val_dataloader
