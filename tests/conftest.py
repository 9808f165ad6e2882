"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's strategy: all tests use tiny synthetic Gaussians so
they run on CPU in seconds; multi-chip sharding is exercised with
``--xla_force_host_platform_device_count=8``.

The environment's axon sitecustomize registers a remote-TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so a plain env-var default is
not enough — we must override the platform through jax.config before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
