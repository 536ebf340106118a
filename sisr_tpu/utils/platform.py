"""Runtime platform selection for CLI entry points.

JAX latches ``JAX_PLATFORMS`` when the package is first imported.  On hosts
where a site hook pre-imports jax before user code runs (e.g. a TPU-relay
``sitecustomize``), exporting ``JAX_PLATFORMS=cpu`` therefore has no effect
and a CLI invoked while the remote TPU service is unreachable blocks forever
in backend-init retries.  Every sisr_tpu console script calls
:func:`apply_platform_env` first so the env var keeps its documented meaning:
``JAX_PLATFORMS=cpu eval_sisr ...`` really runs on host CPU.
"""
import os


def apply_platform_env():
    """Re-apply ``JAX_PLATFORMS`` to the live jax config (idempotent, safe).

    Only single-platform values are forwarded (a comma list keeps JAX's own
    priority semantics, which the config knob does not replicate).  Best
    effort: if jax already initialized a backend this is a no-op for that
    process, matching plain-jax behavior.
    """
    p = os.environ.get('JAX_PLATFORMS')
    if p and ',' not in p:
        try:
            import jax
            jax.config.update('jax_platforms', p)
        except Exception as exc:
            # a silent failure here reintroduces the backend-init hang this
            # hook exists to prevent — surface it, then keep the CLI running
            # with JAX's own platform selection
            import sys
            print('sisr_tpu: could not apply JAX_PLATFORMS=%s to jax.config '
                  '(%s: %s); platform selection falls back to JAX defaults'
                  % (p, type(exc).__name__, exc), file=sys.stderr)
