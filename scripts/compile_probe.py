"""Diagnose the pallas consensus/rank compile-time blowup at bench shape.

Times trace/lower vs backend compile (AOT API) for consensus_array_pallas
and rank_scores_pallas at 50^3/7^3 (the bench fixture shape), and logs
persistent-cache activity.  Run solo on the real chip:

    python scripts/compile_probe.py [consensus|rank|both] [Z Y X]
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    shape = (tuple(int(v) for v in sys.argv[2:5])
             if len(sys.argv) > 4 else (50, 50, 50))

    import jax
    jax.config.update("jax_explain_cache_misses", True)
    import jax.numpy as jnp
    import numpy as np

    from patchperpix_tpu.ops.consensus_jax import ConsensusConfig
    from patchperpix_tpu.ops import pallas_consensus as pc

    ps = (7, 7, 7)
    # mirror the bench/stage-breakdown assembly config (VoteInstancesParams
    # defaults at 50^3/7^3: norm_prob_product consensus, overlapping inst)
    cfg = ConsensusConfig(patchshape=ps, overlapping_inst=True)
    P = int(np.prod(ps))
    rng = np.random.RandomState(0)
    affs = jnp.asarray(rng.rand(P, *shape).astype(np.float32))

    def probe(name, fn, *args, **kw):
        t0 = time.perf_counter()
        lowered = fn.lower(*args, **kw)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        try:
            sz = len(compiled.runtime_executable().serialize())
        except Exception as e:  # noqa: BLE001
            sz = f"serialize-failed: {type(e).__name__}: {e}"
        print(f"PROBE {name}: trace+lower {t1-t0:.1f}s  "
              f"compile {t2-t1:.1f}s  exec_bytes {sz}", flush=True)
        return compiled

    if which in ("consensus", "both"):
        c = probe("consensus_v5", pc.consensus_array_pallas, affs, cfg)
        cons = c(affs)
        cons.block_until_ready()
        print("consensus ran ok", cons.shape, flush=True)
    else:
        cons = pc.consensus_array_pallas(affs, cfg)
        cons.block_until_ready()

    if which in ("rank", "both"):
        r = probe("rank_v5", pc.rank_scores_pallas, affs, cons, cfg)
        t0 = time.perf_counter()
        out = r(affs, cons)
        out.block_until_ready()
        print(f"rank ran ok {out.shape} run {time.perf_counter()-t0:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
