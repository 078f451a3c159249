"""deepsdf_tpu — a TPU-native DeepSDF microstructure shape-optimization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
mkofler96/DeepSDF (auto-decoder SDF learning + differentiable
microstructure meshing + PDE-constrained shape optimization), built for
TPU hardware: functional pytree models, jit/pjit-compiled training with
device meshes, Pallas kernels for the fused point-MLP hot path, and
host-side geometry tooling (marching cubes, PLY IO, FEM) implemented
without the reference's GPU/CUDA dependencies.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  networks/   functional Decoder (ref: deep_sdf/networks/deep_sdf_decoder.py)
  data/       npz SDF sample pipeline (ref: deep_sdf/data.py)
  train/      auto-decoder training loop (ref: train_deep_sdf.py)
  mesh/       grid eval + marching cubes + differentiable extraction
              (ref: deep_sdf/mesh.py)
  ops/        Pallas kernels, B-splines, tiling transforms, analytic SDFs
  parallel/   device-mesh construction + sharding specs (ref has none;
              SURVEY.md §2 parallelism inventory)
  metrics/    chamfer (ref: deep_sdf/metrics/chamfer.py)
  recon/      latent-code inference (restores deleted upstream reconstruct.py)
  eval/       evaluation driver (restores deleted upstream evaluate.py)
  sdf_sampler/ data producers (ref: sdf_sampler/)
  opt/        MMA + FEM elasticity + shape-optimization driver
              (ref: optimization/, analysis/)
  tools/      plotting / export utilities
"""

from . import workspace as ws  # noqa: F401

__version__ = "0.1.0"
