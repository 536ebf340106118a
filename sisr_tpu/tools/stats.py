"""Training statistics CSV + plot utilities (ref: Code/sr_tools/stats.py)."""
import ast
import csv
import os

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import pandas as pd


def plot_stats(stats_dict, keynames, experiment_log_dir, filename):
    """Loss/PSNR/SSIM curves to pdf (ref: stats.py:11-31)."""
    plot_filename = os.path.join(experiment_log_dir, filename)
    valid_keys = [key for key in keynames
                  if all(metric in stats_dict for metric in key)]
    num_plots = len(valid_keys)
    if num_plots == 0 or 'epoch' not in stats_dict:
        return
    f, ax = plt.subplots(num_plots, 1, figsize=(10, 7))
    if num_plots == 1:
        ax = [ax]
    for ind, key in enumerate(valid_keys):
        for metric in key:
            ax[ind].plot(stats_dict['epoch'], stats_dict[metric], label=metric,
                         linestyle='--', marker='o')
        ax[ind].set_xlabel('Epoch')
        ax[ind].legend()
    plt.tight_layout()
    plt.savefig(plot_filename)
    plt.close(f)


def save_statistics(experiment_log_dir, filename, stats_dict, selected_data=None,
                    append=True):
    """Append/write summary.csv (ref: stats.py:63-77)."""
    true_filename = os.path.join(experiment_log_dir, filename)
    pd_data = pd.DataFrame.from_dict(stats_dict)
    if selected_data is not None and os.path.isfile(true_filename):
        existing_cols = pd.read_csv(true_filename, nrows=0).columns.tolist()
        if existing_cols != list(pd_data.columns):
            # column set changed (e.g. resume with a different metric list):
            # appending would write rows that don't match the header — rewrite the
            # whole history (stats_dict carries it, NaN-padded) instead
            append = False
        else:
            if type(selected_data) == int:
                selected_data = [selected_data]
            # keep only the freshest row per selected epoch (resuming from an
            # earlier epoch leaves a stale historical row with the same epoch
            # number in the dict)
            pd_data = pd_data.loc[pd_data['epoch'].isin(selected_data)]
            pd_data = pd_data.drop_duplicates(subset='epoch', keep='last')
    if not os.path.isfile(true_filename):
        append = False
    pd_data.to_csv(true_filename, mode='a' if append else 'w', header=not append,
                   index=False)


def legacy_load_statistics(experiment_log_dir, filename):
    """summary.csv -> dict of lists (ref: stats.py:112-132)."""
    summary_filename = os.path.join(experiment_log_dir, filename)
    with open(summary_filename, 'r') as f:
        lines = f.readlines()
    keys = lines[0].rstrip('\n').split(',')
    stats = {key: [] for key in keys}
    for line in lines[1:]:
        values = line.rstrip('\n').split(',')
        for idx, value in enumerate(values):
            if value == '':
                # pandas writes NaN as an empty cell; keeping '' here would poison
                # resumed stats (string/float comparisons, lexicographic argmax)
                stats[keys[idx]].append(float('nan'))
                continue
            try:
                stats[keys[idx]].append(ast.literal_eval(value))
            except (ValueError, SyntaxError):
                stats[keys[idx]].append(value)
    return stats


def save_stats_and_average(output_dir, filename, metrics):
    """(ref: stats.py:34-60)"""
    av_metrics = []
    av_divider = ['Average'] * len(metrics.keys())
    for index, (key, val) in enumerate(metrics.items()):
        if key == 'Image_Name':
            av_metrics.append('')
            av_divider[index] = ''
        else:
            res = sum(val) / len(val)
            av_metrics.append(res)
            print('Average {}: {:.3f}'.format(key, res))
    stats_loc = os.path.join(output_dir, filename)
    with open(stats_loc, 'w') as f:
        writer = csv.writer(f)
        writer.writerow(list(metrics.keys()))
        total_rows = len(list(metrics.values())[0])
        for idx in range(total_rows):
            writer.writerow([value[idx] for value in metrics.values()])
        writer.writerow(av_divider)
        writer.writerow(av_metrics)
    return stats_loc


def save_vari_stats(save_dir, filename, data):
    """Variable-length stats rows (ref: stats.py:135-140)."""
    filename = os.path.join(save_dir, filename)
    with open(filename, 'w') as f:
        writer = csv.writer(f)
        for key, val in data.items():
            writer.writerow([key] + list(val))


def read_vari_stats(load_dir, filename):
    """(ref: stats.py:143-156)"""
    import numpy as np
    filename = os.path.join(load_dir, filename)
    with open(filename, 'r') as f:
        lines = f.readlines()
    data = {}
    xvals = None
    for index, line in enumerate(lines):
        values = line.rstrip('\n').split(',')
        if index == 0:
            xvals = np.array(values[1:]).astype(int)
        if values[0].endswith('y'):
            # the reference leaves y-series as strings (stats.py:154) — cast like
            # the x axis so numeric consumers don't get lexicographic semantics
            data[values[0][:-2]] = np.array(values[1:]).astype(float)
    return xvals, data
