"""eval_sisr CLI (ref: Code/SISR/net_eval.py).

``--config`` replaces the reference's click_config_file plugin (not available here): it
loads a TOML file whose keys become option defaults; explicit CLI flags still win.
"""
import sys

import click

from .parallel.distributed import maybe_init_distributed

# multi-host launcher hook: must run before anything touches the XLA backend
maybe_init_distributed()

from .configuration import constants as sconst
from .utils import toml_io

results_directory = sconst.results_directory
data_directory = sconst.data_directory


def _config_callback(ctx, param, value):
    if value:
        cfg = toml_io.load(value)
        for key, val in list(cfg.items()):
            if isinstance(val, list) and val and isinstance(val[0], list):
                cfg[key] = [tuple(v) for v in val]
        ctx.default_map = {**(ctx.default_map or {}), **cfg}
    return value


@click.command()
# Data Config
@click.option("--hr_dir", default=None, help='HR image directory.')
@click.option("--lr_dir", default=None, help='LR image directory.')
@click.option("--lr_dir_interp", default=None, help='LR (interpolated) image directory.')
@click.option('--data_attributes', default=None,
              help='Additional data attributes (such as gender etc)')
@click.option("--batch_size", default=1, help='Batch size for parallel data loading.',
              show_default=True)
@click.option('--full_directory', is_flag=True,
              help='Set this flag to ignore any data partitions or splits.')
@click.option('--qpi_selection', type=(int, int), default=(None, None),
              help='Set these values to enforce qpi range when selecting validation data.')
@click.option('--dataset_name', default=None,
              help='Specify dataset name to use associated eval split.')
@click.option('--image_shortlist', default=None,
              help='Location of text file containing image names to select from target '
                   'folder')
@click.option('--data_split', default=None,
              help='Specifies data split to extract (train/test/eval). Defaults to eval.')
@click.option('--metadata_file', default=None,
              help='Location of datafile containing metadata information. Defaults to '
                   'degradation_metadata.csv if not specified.')
@click.option('--use_test_group', is_flag=True,
              help='Set this flag to run results only on typical 100 images.')
@click.option('--recursive', default=False,
              help='Specify whether to search for further images in sub-folders of the '
                   'main lr directory.')
# Model Config
@click.option("-me", "--model_and_epoch", multiple=True, type=(str, str),
              help='Experiments to evaluate.')
@click.option("--gpu/--no-gpu", default=False,
              help='Specify whether or not to use an accelerator for computations.')
@click.option('--mesh', is_flag=True,
              help='Shard eval over all local devices via a data-parallel mesh (the '
                   "TPU-native analog of the reference's gpu='multi'): batches and "
                   'spatial tiles are split across chips.')
@click.option('--eval_buckets', type=int, default=None,
              help='Pad eval images up to multiples of this size and reuse one '
                   'compiled program per bucket (mask-exact; avoids one XLA compile '
                   'per unique image shape on mixed-size sets). 128 is a good value.')
@click.option('--fused_eval', is_flag=True,
              help='Metrics-only fast path: forward + LR baseline + YCbCr + PSNR/SSIM '
                   'fused into ONE device program per batch; only scalars return to '
                   'the host. Needs --no_image_comparison and no image saving. '
                   'Covers metadata, y-channel, pre-upscaled and tiled families; '
                   'LR prep (and interp-model input) uses the MXU bicubic '
                   '(<=1 uint8 LSB vs PIL).')
@click.option('--device_metrics', is_flag=True,
              help='Compute PSNR/SSIM as batched jitted programs on the accelerator '
                   'instead of per-image host numpy (host SSIM otherwise dominates '
                   'eval wall-clock).')
@click.option('--face_model', default='lightcnn',
              type=click.Choice(['lightcnn', 'vggface']), show_default=True,
              help='Face-embedding network for the FACE_SIM metric '
                   '(request it with -m FACE_SIM).')
@click.option('--face_weights', default=None,
              help='Path to the face-network torch weights (defaults to the '
                   'reference external-package paths in configuration/constants).')
@click.option('--int8', 'int8', is_flag=True,
              help='Run supported models (vdsr, edsr, srmd, sftmd, rcan, han, san, '
                   'qrcan, qhan, qsan) through the int8 serving fast path: int8 '
                   'convs at 2x the bf16 MXU rate, calibrated on the first batch; '
                   'attention stages stay f32. Measured 1.13-1.25x at ~40-55 dB vs '
                   'f32 on edsr/rcan/qrcan; other families >35 dB fidelity-tested, '
                   'throughput not yet measured on chip.')
@click.option("--sp_gpu", default=0, show_default=True,
              help='Specify specific device to use for computation.')
@click.option('--scale', default=4, help='Scale of SR to perform.', show_default=True)
# Processing/Output Config
@click.option("--results_name", default='delete_me',
              help='Unique folder name for this output evaluation run.')
@click.option("-m", "--metrics", multiple=True, default=None,
              help='The metrics to calculate on provided test set.')
@click.option('--save_im', is_flag=True,
              help='Set this flag to save all generated SR images to results folder.')
@click.option('--model_only', is_flag=True,
              help='Set this flag to skip all metrics and simply output results.')
@click.option('--model_loc', default=results_directory,
              help='Model save location for loading.')
@click.option("--out_loc", default=results_directory, help='Output directory')
@click.option('--no_image_comparison', is_flag=True,
              help='Set this flag to prevent any image comparisons being generated.')
@click.option('--num_image_save', default=100, show_default=True,
              help='Set the maximum number of images to save when running comparisons.')
@click.option('--time_models/--no-time_models', default=True,
              help='Specify whether to time model execution. Defaults to on.')
@click.option('--cache_decoded/--no-cache_decoded', default=True,
              help='Cache decoded images in memory (capped at 4 GiB) so repeated '
                   'protocol passes and multi-model comparisons skip PNG re-decode — '
                   'on weak hosts decode is the eval throughput ceiling. Default on.')
@click.option('--decoded_cache_dir', default=None,
              help="Persist decoded uint8 '.npy' sidecars so COLD runs skip PNG "
                   "decode entirely (np.load measured 71x faster than decode). "
                   "Pass a cache directory, or 'sidecar' to store them in a "
                   ".decoded_u8/ dir next to each image. Implies --cache_decoded.")
@click.option('--config', type=click.Path(exists=True), callback=_config_callback,
              is_eager=True, expose_value=False,
              help='Read option defaults from a TOML config file.')
def eval_run(model_only, **kwargs):
    """
    Main function that controls the creation, configuration and running of a SISR
    evaluation experiment.
    """
    from .utils.platform import apply_platform_env
    apply_platform_env()
    from .evaluation.standard_eval import EvalHub
    eval_hub = EvalHub(model_only=model_only, **kwargs)
    if model_only:
        eval_hub.direct_model_protocol()
    else:
        eval_hub.full_image_protocol()


if __name__ == '__main__':
    eval_run(sys.argv[1:])
