"""Multi-chip execution: meshes, shardings, distributed updates."""
