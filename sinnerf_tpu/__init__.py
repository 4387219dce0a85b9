"""sinnerf_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
VITA-Group/SinNeRF (training NeRFs from a single posed RGB-D image).

Design principles (vs. the PyTorch reference at /root/reference):

* **Whole-batch jit** — the reference chunks rays through Python loops
  (``models/sinnerf.py:171-193``, ``models/rendering.py:196``); here the full
  ray set of a training step renders in one compiled XLA program, with
  ``lax.map`` tiling only for validation-size batches.
* **Pure functions over param pytrees** — no module state anywhere.  PRNG
  randomness (sample jitter, sigma noise, GAN augments) is threaded through a
  single ``jax.random`` key per step, unlike the reference's mix of numpy /
  torch host RNGs (SURVEY.md §5).
* **Fused hot path** — stratified sampling → positional encoding → MLP →
  alpha compositing compiles into a handful of fused kernels; the inner MLP
  has a Pallas TPU kernel that keeps activations in VMEM
  (``sinnerf_tpu/ops/fused_mlp.py``).
* **SPMD data parallelism** — rays are embarrassingly parallel; multi-chip
  scaling shards the ray batch over a 1-D ``jax.sharding.Mesh`` with gradient
  ``psum`` inside the jitted step (``sinnerf_tpu/parallel``), replacing
  pytorch-lightning DDP/NCCL.
"""

__version__ = "0.1.0"

# TPU env defaults (the raised scoped-VMEM limit the train backward tile
# needs) must be in place before the TPU plugin initializes.  Setting them at
# package import covers every realistic use — you cannot reach the kernels
# without importing the package — not just the CLI entry points.  The flag
# and guard live in sinnerf_tpu._env (imports nothing but os, so it runs
# before anything else the package pulls in); utils.cache.configure_tpu_env
# delegates to the same module, so the two call sites cannot drift.
from sinnerf_tpu._env import configure_tpu_env as _configure_tpu_env

_configure_tpu_env()
