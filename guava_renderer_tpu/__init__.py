"""guava_renderer_tpu — TPU-native feed-forward upper-body 3D Gaussian avatar framework.

A ground-up JAX/XLA/Pallas redesign with the capability surface of the GUAVA
reference renderer (single-image avatar prediction, EHM-driven deformation,
32-channel differentiable Gaussian tile rasterization, StyleUNet refinement,
data-parallel training over a TPU mesh).

Layering (bottom-up):
  core/      pure-function geometry: rotations, LBS, blendshapes, cameras
  ops/       Pallas/XLA kernels: Gaussian rasterizer, mesh z-buffer, SSIM, kNN
  models/    Flax neural modules: ViT encoder, DPT neck, decoders, StyleUNet
  avatar/    inferer, avatar state (a PyTree), deformer, renderer
  data/      tracked-video dataset + record store
  train/     losses, train step, checkpointing, metrics
  parallel/  mesh/sharding helpers
  utils/     config, logging, export
"""

__version__ = "0.1.0"
