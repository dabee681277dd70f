"""Dense geometry: TSDF fusion, mesh extraction, plane-sweep stereo
(the voxblox + ASP parallel_stereo roles, SURVEY.md 2.2)."""
