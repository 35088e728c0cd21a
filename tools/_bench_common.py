"""Shared setup for the bench tools: platform resolution + compile cache.

Import and call BEFORE first jax backend use."""

import os


def setup_platform(platform: str, x64_on_cpu: bool = True) -> None:
    """Resolve --platform: in this container the chip is reachable only
    through the experimental "axon" PJRT plugin (JAX_PLATFORMS=axon in
    the env); on a real TPU runtime "tpu" resolves normally."""
    import jax

    if platform == "tpu" and "axon" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "axon")
    else:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and x64_on_cpu:
            jax.config.update("jax_enable_x64", True)


def enable_compile_cache() -> None:
    """Persistent executable cache: remote-tunnel compiles run minutes;
    cached entries make repeat bench runs cheap."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
