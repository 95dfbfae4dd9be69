"""Parallelism: vmapped instance batches, meshes, Schur row-block path."""
