"""multiview_tpu: a TPU-native rig-calibration and 3D-reconstruction engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
MultiView (NASA ISAAC/Astrobee dense-mapping) toolchain:

- camera models: pinhole with none/FOV/radtan(Tsai)/RPC distortion
  (reference: camera_model/camera_params.{h,cc})
- rig bundle adjustment with bracketed-pose interpolation, depth and mesh
  constraints (reference: rig_calibrator/bin/rig_calibrator.cc)
- SfM front-end: feature detection, descriptor matching, track building,
  global pose initialization (reference: TheiaSfM role)
- TSDF fusion into meshes (reference: voxblox role)
- texture projection (reference: texrecon role)

Design: state lives in pytrees of dense arrays; all per-element math is
written once as JAX functions and vmapped; Jacobians come from autodiff;
the nonlinear solver is a Levenberg-Marquardt core with matrix-free
Schur-complement elimination of structure points; hot kernels (descriptor
distance, rasterization, TSDF) are Pallas TPU kernels; multi-chip scaling
uses jax.sharding meshes with psum/all_gather collectives.
"""

__version__ = "0.1.0"

from multiview_tpu.geometry import pose, distortion, camera, triangulation, registration  # noqa: F401
