"""Image saving + comparison collages (ref: Code/sr_tools/visualization.py).

Images move through this module as N,H,W,C float arrays in [0, 1] (channel-last).
"""
import math
import os

import numpy as np
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import pandas as pd
from PIL import Image

from ..ops.colorspace import ycbcr_convert


def _to_hwc(im):
    if im.ndim == 3 and im.shape[0] in (1, 3) and im.shape[-1] not in (1, 3):
        return im.transpose(1, 2, 0)
    return im


def safe_image_save(images, out_loc, names, config='rgb', max_val=1, im_type='jpg'):
    """Save an N,H,W,C float batch as pngs (ref: visualization.py:31-54)."""
    for index in range(images.shape[0]):
        im = np.asarray(images[index])
        if config == 'ycbcr':
            chw = _to_hwc(im).transpose(2, 0, 1)
            im = ycbcr_convert(chw, input='ycbcr', im_type=im_type).transpose(1, 2, 0)
        else:
            im = _to_hwc(im)
        im = np.clip(im * 255 / max_val, 0, 255).astype(np.uint8)
        if im.shape[-1] == 1:
            im = im[..., 0]
        Image.fromarray(im).save(os.path.join(out_loc, names[index]))


def _index_converter(ind, images_per_row):
    return int(ind / images_per_row), ind % images_per_row


def _hide_unused_axes(ax, rows, images_per_row, images_per_fig, double_indexing):
    for raw_ind in range(images_per_fig, rows * images_per_row):
        ind = _index_converter(raw_ind, images_per_row) if double_indexing else raw_ind
        ax[ind].axis('off')


def _prep_figure(rows, images_per_row, images_per_fig, double_indexing, figsize=(10, 10)):
    f, ax = plt.subplots(rows, images_per_row, figsize=figsize)
    if rows * images_per_row == 1:
        ax = np.array([ax])
    ax = np.atleast_1d(ax)
    _hide_unused_axes(ax, rows, images_per_row, images_per_fig, double_indexing)
    return f, ax


def interpret_sisr_images(image_package, metrics, metric_names, out_loc, names,
                          config='ycbcr', im_type='jpg', max_val=1, direct_view=False,
                          save_images=True, extra_info=None, images_per_row=4):
    """Comparison collage per image (ref: visualization.py:72-185)."""
    images_per_fig = len(image_package)
    rows = math.ceil(images_per_fig / images_per_row)
    # a 1-wide grid gives a 1-D axes array (like a 1-row grid): plain indexing
    double_indexing = rows != 1 and images_per_row != 1
    metrics = metrics if metrics is not None else {}
    metric_names = metric_names if metric_names is not None else []

    image_ordering = {}
    next_index = 0
    for keys in [('HR', 'Ground Truth'), ('LR', 'Low Res')]:
        if keys[0] in image_package:
            image_ordering[keys[0]] = (next_index, keys[1])
            next_index += 1
    for key in image_package:
        if key not in image_ordering:
            title = key
            if len(title) > 14:
                title = title[:int(len(title) / 2)] + '\n' + title[int(len(title) / 2):]
            if extra_info is not None and key in extra_info:
                for line in extra_info[key]:
                    title += '\n%s %s' % (line[0], line[1])
            image_ordering[key] = (next_index, title)
            next_index += 1

    f, ax = _prep_figure(rows, images_per_row, images_per_fig, double_indexing)

    for im_index, name in enumerate(names):
        if im_index:  # re-drawing on the same axes would stack full-res images
            for a in np.ravel(ax):  # and union data limits across image sizes
                a.clear()
            # Axes.clear() re-enables the axis: re-hide the unused grid cells,
            # or every collage after the first grows empty ticked boxes
            _hide_unused_axes(ax, rows, images_per_row, images_per_fig,
                              double_indexing)
        for key, val in image_package.items():
            plot_ind, title = image_ordering[key]
            if double_indexing:
                plot_ind = _index_converter(plot_ind, images_per_row)
            im = _to_hwc(np.asarray(val[im_index]))
            label = ''
            if key in ('HR', 'LR'):
                im_rgb = np.clip(im * 255 / max_val, 0, 255).astype(int)
            else:
                if config == 'ycbcr':
                    conv = ycbcr_convert(im.transpose(2, 0, 1), input='ycbcr',
                                         im_type=im_type).transpose(1, 2, 0)
                    im_rgb = np.clip(conv * 255 / max_val, 0, 255).astype(int)
                else:
                    im_rgb = np.clip(im * 255 / max_val, 0, 255).astype(int)
                for m_name in metric_names:
                    mkey = key + '>' + m_name
                    if mkey in metrics:
                        label += '{}: {:.3f}\n'.format(m_name, metrics[mkey][im_index])
            if im_rgb.shape[-1] == 1:
                im_rgb = im_rgb[..., 0]
            ax[plot_ind].imshow(im_rgb.astype(np.uint8))
            ax[plot_ind].set_xlabel(label, fontsize=13)
            ax[plot_ind].set_xticks([])
            ax[plot_ind].set_yticks([])
            ax[plot_ind].set_title(title, fontsize=16)

        plt.tight_layout()
        if save_images:
            plt.savefig(os.path.join(out_loc, name))
        if direct_view:
            plt.show()
    plt.close(f)


def compare_training_curves(model_loc, out_name, models, metric='val-PSNR',
                            epoch_range=None, psnr_range=None, smooth=False):
    """Validation-curve comparison plot (ref: visualization.py:188-233)."""
    from scipy.signal import savgol_filter
    f = plt.figure(figsize=(14, 6))
    for model in models:
        if '/' in model:
            data = pd.read_csv(os.path.join(model, 'result_outputs/summary.csv'))
        else:
            data = pd.read_csv(os.path.join(model_loc, model,
                                            'result_outputs/summary.csv'))
        x_epoch = data['epoch']
        win = min(11, len(data[metric]) - (1 - len(data[metric]) % 2))
        y_metric = savgol_filter(data[metric], win, min(3, win - 1)) \
            if smooth and win >= 5 else data[metric]
        plt.plot(x_epoch, y_metric, label=model.split('/')[-1])
    if epoch_range is not None:
        plt.xlim(epoch_range[0], epoch_range[1])
    if psnr_range is not None:
        plt.ylim(psnr_range[0], psnr_range[1])
    fs = 20
    plt.xlabel('Epoch number', fontsize=fs)
    plt.ylabel('Validation %s' % metric, fontsize=fs)
    plt.xticks(fontsize=fs - 5)
    plt.yticks(fontsize=fs - 5)
    plt.tight_layout()
    plt.legend(loc='lower right', fontsize=fs - 5)
    plt.savefig(out_name)
    plt.close(f)
