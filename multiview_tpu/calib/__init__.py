"""Rig calibration: BA problem assembly, multi-pass optimization, outlier
rejection, bracketing, rig initialization."""
