"""totton-tpu: a TPU-native audio upsampling DSP framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
Vulkan/VkFFT GPU upsampler (michihitoTakami/totton-rasp-gpu-dsp):

- 80k-tap minimum-phase FIR convolution upsampling (2x/4x/8x/16x, 44.1k/48k
  rate families) as overlap-save frequency-domain convolution
  (reference engine: src/vulkan/vulkan_streaming_upsampler.cpp).
- Equalizer-APO-style parametric EQ baked into the filter spectrum or run as
  cascaded biquads (reference: src/audio/eq_parser.cpp, eq_to_fir.cpp).
- Host-side streaming layer replacing the ALSA capture/playback loop
  (reference: src/alsa/).
- Kaiser-window filter design toolkit with the same .bin+.json sidecar format
  (reference: scripts/filters/, docs/filter_format.md).
- ZMQ control plane + web UI (reference: src/zmq/, web/).
- NEW vs the reference: multi-chip / multi-host execution — channels and
  time-blocks sharded over a jax.sharding.Mesh with overlap-save halo exchange
  via jax.lax.ppermute.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TOTTON_PLATFORM"):
    # Explicit platform override (e.g. TOTTON_PLATFORM=cpu for tests and CI
    # hosts where the TPU plugin force-registers itself). Must run before
    # any JAX backend initialization.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TOTTON_PLATFORM"])


def _enable_persistent_compile_cache() -> None:
    """Default-on persistent XLA compilation cache.

    TPU compiles of the production dispatch shapes take O(minutes) through
    a remote runtime; the cache makes every shape a one-time cost across
    ALL processes (CLI one-shots included). TOTTON_COMPILE_CACHE: unset/1 =
    default path (~/.cache/totton_tpu/jax), a path = that directory,
    0/off = disabled. Set via env (not jax.config) so importing totton_tpu
    stays jax-import-free for control/web-only processes.
    """
    val = _os.environ.get("TOTTON_COMPILE_CACHE", "1")
    if val.lower() in ("0", "off", "false", ""):
        return
    path = val if val.lower() not in ("1", "on", "true") else _os.path.join(
        _os.path.expanduser("~"), ".cache", "totton_tpu", "jax")
    try:
        _os.makedirs(path, exist_ok=True)
    except OSError:
        return
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import sys as _sys

    if "jax" in _sys.modules:
        # Too late for the env var: jax reads it at import, and some TPU
        # runtimes (the axon sitecustomize here) import jax before any
        # user code runs. The config API works post-import.
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])


_enable_persistent_compile_cache()
