"""Run the ACTUAL reference CPU vote_instances on the FlyLight crop.

Imports /root/reference/PatchPerPix (read-only) with minimal import shims
for packages absent in this environment (skimage/zarr; only functions the
CPU assembly path never touches are stubbed).  Used to (a) time the true
reference implementation for the bench baseline and (b) compare its
instance output against this repo's engines on identical inputs.

Usage: python benchmarks/reference_cpu.py [size]   (default: full 50)
Writes benchmarks/reference_cpu_<size>.json
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SHIMS = "/tmp/refshims"
os.makedirs(os.path.join(SHIMS, "skimage"), exist_ok=True)
_SHIM_FILES = {
    "skimage/__init__.py": "",
    "skimage/io.py": ("def imsave(*a, **k):\n"
                      "    raise NotImplementedError\n"),
    "skimage/draw.py": ("def line(*a, **k):\n"
                        "    raise NotImplementedError\n"),
    "skimage/morphology.py": (
        "import numpy as np\n"
        "from scipy import ndimage\n"
        "def skeletonize_3d(x):\n"
        "    raise NotImplementedError\n"
        "def binary_dilation(img, footprint=None):\n"
        "    return ndimage.binary_dilation(img, structure=footprint)\n"
        "def ball(r):\n"
        "    z, y, x = np.ogrid[-r:r+1, -r:r+1, -r:r+1]\n"
        "    return (z*z + y*y + x*x) <= r*r\n"),
    "zarr.py": ("def __getattr__(name):\n"
                "    raise NotImplementedError\n"),
    # cuda_code.py imports pycuda at module level even on the CPU path;
    # only alloc_zero_array is reachable with cuda=False
    "pycuda/__init__.py": "",
    "colorcet.py": "glasbey_light = ['#d60000'] * 256\n",
    "nrrd.py": ("def write(*a, **k):\n"
                "    raise NotImplementedError\n"),
    "gunpowder/__init__.py": (
        "class BatchFilter:\n"
        "    pass\n"
        "def __getattr__(name):\n"
        "    raise NotImplementedError(name)\n"),
    "numcodecs.py": ("class Blosc:\n"
                     "    ZSTD = 0\n"
                     "    BITSHUFFLE = 2\n"
                     "    def __init__(self, *a, **k):\n"
                     "        pass\n"),
    "pycuda/compiler.py": ("def DynamicSourceModule(*a, **k):\n"
                           "    raise NotImplementedError\n"),
    "pycuda/driver.py": (
        "import numpy as np\n"
        "class mem_attach_flags:\n"
        "    GLOBAL = 0\n"
        "def managed_zeros(shape, dtype=None, mem_flags=0):\n"
        "    return np.zeros(shape, dtype=dtype)\n"),
}
for rel, content in _SHIM_FILES.items():
    p = os.path.join(SHIMS, rel)
    if not os.path.exists(p) or open(p).read() != content:
        open(p, "w").write(content)
sys.path.insert(0, SHIMS)
sys.path.insert(0, "/root/reference")


def ref_kwargs(patchshape):
    """kwargs for the reference to_instance_seg, matching bench.py's
    VoteInstancesParams (flylight-style whole-volume CPU run)."""
    return dict(
        patchshape=np.asarray(patchshape), cuda=False, blockwise=False,
        debug=False, isbiHack=False, pad_with_ps=False,
        skeletonize_foreground=False, overlapping_inst=True,
        patch_threshold=0.5, fc_threshold=0.5, mws=True, mutex=True,
        select_patches_for_sparse_data=True, includeSinglePatchCCS=True,
        removeIntersection=True, use_score_oracle=False,
        score_threshold=False, skipConsensus=False, skipLookup=False,
        skipRanking=False, skipSelection=False, skipThinCover=False,
        termAfterThinCover=False, termAfterPatchGraph=False,
        graphToInst=False, check_required=False,
        save_no_intermediates=True, store_scores=False,
        store_selected_hdf=False, shuffle_patches=False,
        selected_patches=None, selected_patch_pairs=None,
        ranked_patches=None, consensus=None, aff_graph=None,
        return_intermediates=False, sparse_labels=False,
        one_instance_per_channel=False, result_folder="/tmp/refout",
        numinst_key=None, numinst_threshs=None,
        fg_thresh_vi=-1, flip_cons_arr_axes=False,
        vi_bg_use_inv_th=True, vi_bg_use_half_th=False,
        vi_bg_use_less_than_th=False,
        consensus_norm_prob_product=True, consensus_prob_product=True,
        consensus_norm_aff=True, consensus_interleaved_cnt=True,
        rank_norm_patch_score=True, rank_int_counter=False,
        patch_graph_norm_aff=True,
        max_total_patch_distance_in_ps_multiples=2,
        thin_cover_use_kd=False, mark_close_neighboorhood=False,
        select_patches_overlap_neighborhood=False,
        crop_to_foreground=False, add_suffix=False,
        sample=1,  # patch-fg subsampling fraction (1 = keep all)
    )


def _patch_random_sample():
    """The reference calls random.sample on a set (removed in py3.11)."""
    import random

    orig = random.sample

    def sample(population, k, **kw):
        if isinstance(population, (set, frozenset)):
            population = sorted(population)
        return orig(population, k, **kw)

    random.sample = sample


def main():
    _patch_random_sample()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    no_inter = "--no-intersection" in sys.argv
    size = int(args[0]) if args else 50
    sys.path.insert(0, REPO)
    from bench import PS, build_inputs

    affs, fg, numinst = build_inputs(size=None if size >= 50 else size)
    fg = fg.copy()

    from PatchPerPix.vote_instances.vote_instances import to_instance_seg

    os.makedirs("/tmp/refout", exist_ok=True)
    kwargs = ref_kwargs(PS)
    tag = str(size)
    if no_inter:
        kwargs["removeIntersection"] = False
        tag = f"{size}_nolcg"
    t0 = time.perf_counter()
    res = to_instance_seg(affs.astype(np.float32), fg, fg.copy(),
                          numinst, **kwargs)
    wall = time.perf_counter() - t0
    inst = res[0] if isinstance(res, tuple) else res
    n = len(np.unique(inst[inst > 0]))
    out = {"size": size, "no_intersection": no_inter,
           "wall_s": wall, "n_instances": int(n),
           "fg_vox": int(fg.sum())}
    print(json.dumps(out))
    with open(os.path.join(REPO, f"benchmarks/reference_cpu_{tag}.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    np.save(os.path.join(REPO, f"benchmarks/reference_inst_{tag}.npy"),
            inst)
    if size >= 50 and not no_inter:
        # full volume: record as the bench assembly denominator
        bl_path = os.path.join(REPO, "bench_baseline.json")
        if os.path.exists(bl_path):
            bl = json.load(open(bl_path))
            bl["t_assemble_reference_full_s"] = wall
            json.dump(bl, open(bl_path, "w"), indent=1)


if __name__ == "__main__":
    main()
