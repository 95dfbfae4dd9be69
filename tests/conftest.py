"""Test harness config: run everything on a virtual 8-device CPU mesh in
float64 (parity with the reference's Float64 default).

The image's sitecustomize force-registers the axon TPU backend and sets
``jax_platforms="axon,cpu"``; we flip it back to pure CPU *before* any
backend is initialized so tests never touch the TPU tunnel, and request 8
host devices so sharding tests exercise real multi-device code paths
(SURVEY.md §4 rebuild mapping (e)).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
