"""Training-DYNAMICS parity vs the reference's actual torch training loop.

Forward parity (test_weight_parity) pins single-step outputs; this pins the
*trajectory*: same init + same batches through N steps of the reference's
``BaseModel.run_train``/``standard_update`` (torch Adam + global-norm clip +
per-batch ``scheduler.step()``, ref: SISR/models/__init__.py:466-489) vs our
``BaseHandler.run_train`` (optax adam chain + closed-form per-step schedule).
Loss trajectories and final parameters must agree to f32 tolerance — this catches
clip-before-step ordering, scheduler off-by-one, and Adam eps-placement silently
diverging the two frameworks.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF_CODE = '/root/reference/Code'
pytestmark = [pytest.mark.skipif(not os.path.isdir(REF_CODE),
                                 reason='reference code unavailable'),
              pytest.mark.slow]

N_STEPS = 20
SCHEDULER = 'cosine_annealing_warm_restarts'
# restart_period < N_STEPS so the trajectory crosses a warm restart boundary
SCHED_PARAMS = {'t_mult': 1, 'restart_period': 8, 'lr_min': 1e-6}
LR = 1e-3


@pytest.fixture(scope='module')
def ref_handlers():
    from sisr_tpu.utils.ref_compat import install_reference_import_shims
    install_reference_import_shims(REF_CODE)
    import SISR.models.advanced.handlers as adv_handlers
    import SISR.models.attention_manipulators.handlers as q_handlers
    return adv_handlers, q_handlers


def _sd(net):
    return {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}


def _max_param_delta(flax_a, flax_b):
    import jax
    deltas = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                                    - np.asarray(b, np.float64)).max()),
                          flax_a, flax_b)
    return max(jax.tree.leaves(deltas))


def _run_trajectories(torch_step, our_handler, our_batch_fn):
    """Drive both training loops on identical batches; return per-step losses.
    ``torch_step(lr_nchw, hr_nchw, meta)`` runs one reference train step."""
    rng = np.random.RandomState(42)
    ref_losses, our_losses = [], []
    for _ in range(N_STEPS):
        lr_np = rng.rand(2, 8, 8, 3).astype(np.float32)
        hr_np = rng.rand(2, 16, 16, 3).astype(np.float32)
        meta_np = rng.rand(2, 10).astype(np.float32)
        loss_ref = torch_step(torch.from_numpy(lr_np.transpose(0, 3, 1, 2)),
                              torch.from_numpy(hr_np.transpose(0, 3, 1, 2)), meta_np)
        ref_losses.append(float(loss_ref))
        loss_ours, _ = our_handler.run_train(**our_batch_fn(lr_np, hr_np, meta_np))
        our_losses.append(float(np.asarray(loss_ours)))
    return np.array(ref_losses), np.array(our_losses)


def test_edsr_training_trajectory(ref_handlers, tmp_path):
    adv_handlers, _ = ref_handlers
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.tools.convert_weights import convert_torch_state_dict

    torch.manual_seed(3)
    cfg = dict(lr=LR, scale=2, num_features=8, num_blocks=2,
               scheduler=SCHEDULER, scheduler_params=dict(SCHED_PARAMS),
               grad_clip=0.5)
    th = adv_handlers.EDSRHandler(device=torch.device('cpu'),
                                  model_save_dir=str(tmp_path), eval_mode=False,
                                  **cfg)
    init_params = convert_torch_state_dict('edsr', _sd(th.net), num_blocks=2, scale=2)

    ours = define_model('edsr', eval_mode=False, **cfg)
    ours.init_state(spatial=(8, 8), batch=2)
    ours.state = ours.state.replace(params=init_params)

    ref_losses, our_losses = _run_trajectories(
        lambda x, y, m: th.run_train(x, y)[0], ours,
        lambda lr_np, hr_np, m: {'lr': lr_np, 'hr': hr_np})
    import jax
    param_delta = _max_param_delta(
        convert_torch_state_dict('edsr', _sd(th.net), num_blocks=2, scale=2),
        jax.tree.map(np.asarray, ours.state.params))

    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=2e-4, atol=2e-6,
        err_msg='EDSR loss trajectory diverges from torch (clip/scheduler/Adam '
                'ordering mismatch?)')
    assert param_delta < 5e-5, \
        'EDSR params diverge from torch after %d steps: max delta %.3g' % (
            N_STEPS, param_delta)
    # the schedule must actually have moved (otherwise this test proves nothing)
    assert th.learning_rate_scheduler.get_last_lr()[0] != LR


def test_qrcan_training_trajectory(ref_handlers, tmp_path):
    _, q_handlers = ref_handlers
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.tools.convert_weights import convert_torch_state_dict

    torch.manual_seed(5)
    # n_feats >= reduction(16) so the reference's QCALayer channel bottleneck is >0
    arch = dict(n_feats=16, n_resblocks=1, n_resgroups=1, style='max_concat',
                include_q_layer=True)
    th = q_handlers.QRCANHandler(device=torch.device('cpu'),
                                 model_save_dir=str(tmp_path), eval_mode=False,
                                 lr=LR, scale=2, metadata=['blur_kernel'],
                                 scheduler=SCHEDULER,
                                 scheduler_params=dict(SCHED_PARAMS), **arch)
    conv_kwargs = dict(n_resgroups=1, n_resblocks=1, scale=2, style='max_concat',
                       include_q_layer=True)
    init_params = convert_torch_state_dict('qrcan', _sd(th.net), **conv_kwargs)

    ours = define_model('qrcan', eval_mode=False, lr=LR, scale=2,
                        metadata=['blur_kernel'], scheduler=SCHEDULER,
                        scheduler_params=dict(SCHED_PARAMS), **arch)
    ours.set_metadata_keys(['blur_kernel'] * 10)
    ours.init_state(spatial=(8, 8), batch=2)
    ours.state = ours.state.replace(params=init_params)

    keys = [('blur_kernel',)] * 10
    ref_losses, our_losses = _run_trajectories(
        lambda x, y, m: th.run_train(x, y, metadata=torch.from_numpy(m),
                                     metadata_keys=keys)[0],
        ours, lambda lr_np, hr_np, m: {'lr': lr_np, 'hr': hr_np, 'metadata': m})

    import jax
    param_delta = _max_param_delta(
        convert_torch_state_dict('qrcan', _sd(th.net), **conv_kwargs),
        jax.tree.map(np.asarray, ours.state.params))

    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=2e-4, atol=2e-6,
        err_msg='QRCAN loss trajectory diverges from torch')
    assert param_delta < 5e-5, \
        'QRCAN params diverge from torch after %d steps: max delta %.3g' % (
            N_STEPS, param_delta)
