"""Nonlinear least-squares machinery: robust losses, Levenberg-Marquardt,
matrix-free Schur-complement bundle adjustment."""
