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
