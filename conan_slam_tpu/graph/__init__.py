"""Pose-graph backend for loop closure (BASELINE.json config 4)."""
