"""Parallel execution: device meshes, vmapped batch solves, sharded sweeps."""
