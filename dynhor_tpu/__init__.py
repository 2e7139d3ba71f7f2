"""dynhor_tpu — TPU-native rebuild of EAST-J/Dynhor (CVPR'25).

A JAX/XLA/Pallas framework for hand-held object reconstruction from RGB
video: differentiable-rendering object pose tracking (reference:
ObjTracker/) followed by NeuS-style SDF reconstruction with an
instant-NGP hash-grid fast path (reference capability targets, see
SURVEY.md §2.4).

Design stance (TPU-first, not a port):
  * All hot compute is jit-compiled, statically shaped, batched over
    frames / prior views / rays so matmuls land on the MXU.
  * The per-frame pose refinement (reference pose_initializtion.py:347-356,
    a sequential Python loop over frames) is vmapped across the whole video.
  * Rasterization (reference: neural_renderer + PyTorch3D CUDA) is
    re-designed as soft/hard rasterizers in pure JAX with Pallas kernels
    for the hot paths.
  * Multi-chip scaling uses jax.sharding.Mesh + shard_map with XLA
    collectives over ICI (frames / rays / sequences axes).
"""

__version__ = "0.1.0"
