"""Texturing: ray casting, view selection, atlas packing, seam leveling,
OBJ/MTL output (the texrecon + ISAAC texture_processing roles)."""
