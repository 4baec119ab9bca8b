"""Distributed layer: device meshes, sharded batch encode, multi-host gather."""
