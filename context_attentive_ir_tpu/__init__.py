"""context_attentive_ir_tpu: a TPU-native rank-and-suggest engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``wasiahmad/context_attentive_ir`` (CARS, SIGIR 2019; arXiv:1906.02329):
session-aware neural document ranking, next-query suggestion, and joint
multitask models, engineered for TPU (static shapes, ``lax.scan``
recurrences, slate-batched MXU einsums, ``pjit`` data parallelism).

See SURVEY.md at the repo root for the capability inventory this package
implements, and BASELINE.md for the performance targets.
"""

__version__ = "0.1.0"
