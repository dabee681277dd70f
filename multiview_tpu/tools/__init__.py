"""Command-line tools mirroring the reference executables/wrappers:
calibrate (rig_calibrator), sfm-init (theia_sfm), fuse-mesh
(multi_stereo + voxblox), texture (texrecon), fit-rpc, undistort.
Run via ``python -m multiview_tpu <tool> ...``."""
