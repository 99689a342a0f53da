"""Run state: per-partition checkpoint manifests and resume logic."""
