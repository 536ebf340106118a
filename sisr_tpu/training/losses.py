"""Training losses: L1, MSE and the VGG perceptual mechanism.

ref: Code/sr_tools/loss_functions.py (PerceptualMechanism = lambda_pixel * L1(pixel) +
lambda_per * L1(VGG54 features)), Code/SISR/models (per-handler criterion choice).
"""
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def build_loss(loss_type='l1', perceptual=None, vgg_apply=None, lambda_pixel=1.0):
    """Return a pure ``(pred, target) -> scalar`` loss.

    :param perceptual: lambda for the VGG feature term (the reference's ``perceptual``
        internal_param, loss_functions.py:6-22); requires ``vgg_apply``.
    :param vgg_apply: pure fn mapping (N, H, W, 3) -> features, built by
        :mod:`sisr_tpu.models.feature_extractors`.
    """
    base = {'l1': l1_loss, 'mse': mse_loss}[loss_type]
    if perceptual is None:
        return base

    if loss_type != 'l1':
        # reference parity: PerceptualMechanism REPLACES the criterion and its
        # pixel term is always L1 (ref loss_functions.py:6-22) — say so instead
        # of silently training with a different pixel loss than configured
        print("Warning: perceptual loss overrides the configured '%s' pixel "
              "criterion with L1 (reference PerceptualMechanism semantics)."
              % loss_type)

    if vgg_apply is None:
        raise RuntimeError('Perceptual loss requested but no VGG feature extractor is '
                           'available (provide pretrained weights — see '
                           'sisr_tpu/models/feature_extractors.py).')

    def loss(pred, target):
        gen = vgg_apply(pred)
        real = jnp.asarray(vgg_apply(target))
        return lambda_pixel * l1_loss(pred, target) + perceptual * l1_loss(gen, real)

    return loss
