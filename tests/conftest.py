import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path via __graft_entry__.dryrun_multichip).
#
# NOTE: the session environment exports JAX_PLATFORMS=axon (the TPU tunnel)
# and the axon plugin overrides a plain env-var change, so pin the platform
# through jax.config before any device is touched.  Running the matrix
# through the tunnel is slow and contends with bench runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
