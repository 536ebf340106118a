"""Learning-rate schedules as optax-style ``step -> lr`` functions.

CRITICAL SEMANTICS: the reference steps its torch schedulers once per BATCH, not per epoch
(ref: Code/SISR/models/__init__.py:488-489), so all schedule counters here are in optimizer
steps and config values like ``restart_period`` / ``milestones`` are in batches.  This
matches e.g. Documentation/sample_config_files/div2k/edsr.toml (restart_period 40000).

Closed-form (trace-friendly) implementations — no data-dependent python control flow.
"""
import jax.numpy as jnp


def cosine_annealing_warm_restarts(base_lr, restart_period, t_mult=1, lr_min=0.0):
    """torch CosineAnnealingWarmRestarts stepped per batch
    (ref: models/__init__.py:303-307)."""
    t0 = float(restart_period)
    tm = float(t_mult)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if tm == 1.0:
            t_cur = jnp.mod(step, t0)
            t_i = t0
        else:
            # the tiny epsilon keeps exact restart boundaries from rounding DOWN in
            # float32 (log(4)/log(2) can evaluate 1.9999999 -> cycle 1 instead of 2,
            # which would emit lr_min at a step where torch restarts to base_lr)
            n = jnp.floor(jnp.log(step / t0 * (tm - 1.0) + 1.0) / jnp.log(tm)
                          + 1e-6)
            t_cur = step - t0 * (tm ** n - 1.0) / (tm - 1.0)
            t_i = t0 * tm ** n
        return lr_min + (base_lr - lr_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))

    return schedule


def multi_step_lr(base_lr, milestones, gamma):
    """torch MultiStepLR (ref: models/__init__.py:308-311); milestones in steps."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n_passed = jnp.sum(step >= ms)
        return base_lr * gamma ** n_passed

    return schedule


def step_lr(base_lr, step_size, gamma):
    """torch StepLR (ref: models/__init__.py:324-327)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * gamma ** jnp.floor(step / step_size)

    return schedule


def custom_dasr(base_lr):
    """The reference's DASR LambdaLR (ref: models/__init__.py:312-323).

    NB: torch LambdaLR multiplies the optimizer's base lr by the lambda — the reference's
    lambda returns absolute-looking values (1e-3 ...) that nevertheless get multiplied by
    the configured lr.  Also, the lambda's 'epoch' argument is LambdaLR's internal step
    counter, which the reference advances per BATCH (models/__init__.py:488-489), so the
    60/225/125 breakpoints — DASR's published per-EPOCH schedule — fire within the first
    epochs of any realistically-sized dataset.  Both quirks are preserved for parity.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor((step - 100.0) / 125.0)
        late = 1e-4 * 0.5 ** cycle
        lam = jnp.where(step < 60, 1e-3, jnp.where(step < 225, 1e-4, late))
        return base_lr * lam

    return schedule


def constant(base_lr):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)

    return schedule


def build_schedule(lr, scheduler=None, scheduler_params=None):
    """Build a schedule from the reference's TOML naming
    (ref: models/__init__.py:302-329)."""
    if scheduler is None:
        return constant(lr)
    scheduler_params = scheduler_params or {}
    if scheduler == 'cosine_annealing_warm_restarts':
        return cosine_annealing_warm_restarts(lr, scheduler_params['restart_period'],
                                              scheduler_params.get('t_mult', 1) or 1,
                                              scheduler_params.get('lr_min', 0.0) or 0.0)
    if scheduler == 'multi_step_lr':
        return multi_step_lr(lr, scheduler_params['milestones'], scheduler_params['gamma'])
    if scheduler == 'step_lr':
        return step_lr(lr, scheduler_params['step_size'], scheduler_params['gamma'])
    if scheduler == 'custom_dasr':
        return custom_dasr(lr)
    raise RuntimeError('%s scheduler not implemented' % scheduler)
