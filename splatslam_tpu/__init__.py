"""splatslam_tpu — a TPU-native (JAX/XLA/Pallas) dense RGB SLAM framework.

Re-implements the full capability surface of Splat-SLAM (reference:
google-research/Splat-SLAM): a DROID-style neural tracker with the DSPO
(disparity / scale / pose) bundle-adjustment layer, a deformable
3D-Gaussian-Splatting mapper, and a monocular-depth prior — re-designed
TPU-first:

  * all solvers (dense bundle adjustment, Schur complement, Cholesky) run
    on-chip in XLA instead of the reference's CPU-Eigen/CUDA split
    (reference: thirdparty/glorie_slam/lib/droid_kernels.cu:1117-1437),
  * the correlation-volume lookup and tile rasterizer are MXU/VPU-shaped
    kernels instead of CUDA gather kernels,
  * the two-process tracker/mapper pipeline (reference: src/slam.py:246-261)
    collapses into a single host loop driving one device program stream,
  * camera-pose gradients of the renderer come from end-to-end autodiff of
    the projection pipeline rather than hand-derived CUDA VJPs
    (reference: diff-gaussian-rasterization-w-pose).
"""

__version__ = "0.1.0"

def enable_compilation_cache():
    """Persistent on-disk compilation cache: kernel shapes are bucketed, so
    across runs (and driver rounds) nearly every jit hits the cache instead
    of the (slow, remote) TPU compiler."""
    import jax
    import os
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/splatslam_jax"))
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # cache EVERYTHING: under the axon remote-compile tunnel even a
        # trivial eager op costs a ~0.4 s compiler RPC (10 s on hiccups);
        # a measured warm 12-frame bench spent 228 s recompiling 416 tiny
        # programs that the 1.0 s threshold had excluded from the cache
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


enable_compilation_cache()
