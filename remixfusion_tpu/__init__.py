"""remixfusion_tpu — a TPU-native online RGB-D SLAM / dense reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of RemixFusion
(lanlan96/RemixFusion): an online RGB-D SLAM pipeline with a mixed scene
representation — an explicit coarse TSDF+RGB voxel grid fused classically from
depth frames, plus an implicit residual field (multiresolution hash encoding +
tiny MLP) that corrects the coarse grid's SDF and color. Camera tracking is
gradient-free randomized pose optimization against a moving local TSDF volume;
mapping is gradient-based neural optimization plus an MLP-amortized bundle
adjustment over keyframe poses.

Architecture (TPU-first, one process, one chip by default):
  - All volumes / model params / pose buffers are jnp arrays in HBM.
  - Tracking is ONE jitted step function (all 20 particle iterations on
    device, no per-iteration host readback — cf. reference
    model/ROtracker.py:713-831 which reads scores back every iteration).
  - Mapping / bundle adjustment are jitted optax train steps.
  - The reference's two-process shared-CUDA-memory design (run.py:105-119)
    collapses into a deterministic interleave of the two step functions with
    JAX async dispatch providing overlap.
  - Multi-chip scale-out shards the ray batch (data parallel) and the global
    voxel grid spatially over a jax.sharding.Mesh; see remixfusion_tpu.parallel.
"""

__version__ = "0.1.0"

from remixfusion_tpu.config import load_config  # noqa: F401
