"""Shared utilities: synthetic scenes, timing, misc helpers."""
