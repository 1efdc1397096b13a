"""PatchPerPix-TPU: a TPU-native (JAX/XLA/Pallas) instance segmentation framework.

Re-implements the capabilities of PatchPerPix (proposal-free instance
segmentation via dense per-pixel patch predictions + consensus-vote assembly,
ECCV 2020) as an idiomatic JAX/XLA/Pallas framework designed for TPU:

- ``models``   : Flax U-Net emitting per-pixel patch affinities (or codes) and
                 fg/bg / num-instances heads; patch decoder for the ppp+dec
                 variant. (reference: experiments/.../torch_model.py)
- ``ops``      : the vote-instances assembly math (consensus voting, patch
                 ranking, foreground cover, patch-affinity graph, connected
                 components / mutex watershed) as XLA/Pallas programs plus a
                 numpy golden reference.
                 (reference: PatchPerPix/vote_instances/*)
- ``assembly`` : the end-to-end vote_instances pipeline driver, whole-volume
                 and blockwise. (reference: vote_instances.py,
                 stitch_patch_graph.py)
- ``train``    : data pipeline + augmentations + optax/orbax training loop.
                 (reference: experiments/.../train.py)
- ``infer``    : sliding-window prediction and code->patch decoding.
                 (reference: predict_no_gp.py, decode.py)
- ``evaluate`` : instance metrics (IoU / clDice localization, greedy /
                 hungarian assignment, multi-threshold confusion matrices)
                 and prediction metrics. (reference: PatchPerPix/evaluate +
                 external evaluate-instance-segmentation package)
- ``parallel`` : jax.sharding mesh helpers and spatially-sharded assembly
                 (shard_map + halo exchange over ICI).
- ``utils``    : zarr (tensorstore) / hdf5 volume IO, config, postprocessing.
"""

__version__ = "0.1.0"


def _setup_compilation_cache():
    """Persistent XLA compilation cache (opt out with PPP_TPU_NO_CACHE=1).

    TPU compiles of the consensus/rank programs take tens of seconds; the
    cache makes every process after the first start instantly."""
    import os

    if os.environ.get("PPP_TPU_NO_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "PPP_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "patchperpix_tpu", "jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best effort
        pass


_setup_compilation_cache()
