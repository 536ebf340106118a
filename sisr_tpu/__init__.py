"""
sisr_tpu — a TPU-native (JAX / Flax / XLA / Pallas) single-image super-resolution framework.

Re-implements the full capability surface of the Deep-FIR SISR framework
(um-dsrg/Super-Resolution-Meta-Attention-Networks) with a TPU-first architecture:

* NHWC feature layout, bf16-friendly compute, static shapes under ``jit``.
* Functional model zoo (Flax modules + pure train/eval steps) instead of stateful handlers.
* Batch/data parallelism over a ``jax.sharding.Mesh`` (ICI) instead of ``nn.DataParallel``.
* Static-shape spatial tiling instead of recursive ``forward_chop``.
* Host data pipeline with device prefetch instead of torch ``DataLoader`` workers.

The user-facing contracts of the reference are preserved verbatim: CLI entry points
(``train_sisr``, ``eval_sisr``, ``image_manipulate``, ...), the TOML config schema, the
experiment directory layout, ``degradation_metadata.csv`` formats and the metric CSV outputs.
"""

__version__ = "0.1.0"
