"""Multi-chip scaling: device meshes, observation sharding, distributed BA."""
