"""Backend selection helper for CLI tools.

The axon sitecustomize force-registers the TPU backend at interpreter
start and overrides JAX_PLATFORMS, so exporting JAX_PLATFORMS=cpu alone
does not move a tool off the chip. The jax config knob still wins if it
is applied before first backend use; every tool entry point calls
`honor_platform_env()` first so `JAX_PLATFORMS=cpu python tools/x.py`
behaves as expected (reference analogue: CUDA_VISIBLE_DEVICES gating in
the benchmark launchers, examples/hstu/training/benchmark/).
"""
import os


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; nothing we can do


def enable_compile_cache(root: str) -> None:
    """Persist compiled executables across runs (single-core host; remote
    TPU compiles are the dominant tool cost)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(root, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
