"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: this machine's sitecustomize registers the TPU PJRT plugin and imports
jax at interpreter start, so JAX_PLATFORMS env vars set here are too late —
we must use jax.config.update instead.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
