"""swift_tpu — a TPU-native JAX framework for autoregressive consistency
weather models (diffusion / TrigFlow / sCM on ERA5), built from scratch with
the capabilities of the reference PyTorch framework (stockeh/swift).

Design stance (see SURVEY.md §7):
  * functional core — models are pure ``apply(params, ...)`` functions,
    optimizer/EMA state are pytrees, the train step is one jitted function;
  * one device mesh — data/member/ic parallelism are sharding annotations
    under ``jax.jit``, not explicit collectives;
  * rollout is a ``jax.lax.scan`` program, not a Python loop;
  * NHWC channels-last layout everywhere (TPU-native), bf16 compute with
    fp32 parameters.
"""

from pathlib import Path

PROJECT_DIR = Path(__file__).resolve().parent.parent

__version__ = "0.1.0"
