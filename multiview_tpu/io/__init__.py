"""File I/O in the reference's exact interchange formats: rig_config.txt,
cameras.txt pose lists, NVM_V3, PLY/OBJ meshes, xyz-image depth clouds."""
