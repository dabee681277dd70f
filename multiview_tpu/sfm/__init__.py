"""SfM front-end: feature detection, descriptor matching, geometric
verification, track building, global pose initialization (the TheiaSfM +
OpenCV-SIFT replacement, SURVEY.md 2.1-2.2)."""
