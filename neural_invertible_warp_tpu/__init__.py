"""neural_invertible_warp_tpu — TPU-native (JAX/XLA/Pallas) framework for joint
NeRF + camera-pose optimization with invertible neural ray warps.

A ground-up re-design of the capabilities of ``sfchng/neural_invertible_warp``
("Invertible Neural Warp for NeRF", ECCV 2024): radiance field + per-image pose
(SE(3) or RealNVP-style invertible warp) optimized jointly with photometric and
SVD-based global-alignment losses. Compute path is pure JAX/XLA with Pallas
kernels for the hot ray-march loop; scaling is via ``jax.sharding`` meshes.

Public surface preserved from the reference: ``options/*.yaml`` configs with
``_parent_`` inheritance + dot-notation CLI overrides, the
``nerf``/``barf``/``garf``/``*_inn_*`` model zoo, LLFF/Blender/DTU/iPhone/T&T
dataset formats, and the eval suite (PSNR/SSIM/LPIPS, Procrustes/ATE-aligned
pose error, DTU depth error).
"""

__version__ = "0.1.0"
