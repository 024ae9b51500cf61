"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# full fp32 matmul/conv accumulation for torch-parity tests (production on
# TPU intentionally runs the encoders in bf16 like the reference's AMP path)
jax.config.update("jax_default_matmul_precision", "highest")

# This machine's sitecustomize pins JAX_PLATFORMS=axon (the real TPU via a
# tunnel), overriding the env var above. Pin computation to local CPU so
# tests are deterministic, parallel-safe, and don't contend with TPU
# benchmarks. Set SPLATSLAM_TEST_TPU=1 to run the suite on the TPU instead.
if not os.environ.get("SPLATSLAM_TEST_TPU"):
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass
