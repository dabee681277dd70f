"""Geometry core: poses, distortion models, cameras, triangulation, registration."""
