import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import; forced even
# when the session env selects a TPU platform (tests must not contend with
# benchmark runs for the single tunneled chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent jit cache makes repeated test runs fast (compile once)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openhevc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
