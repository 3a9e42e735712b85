#!/usr/bin/env python
"""Time the fused DLF/CDEF chain at 1080p with configurable search sets."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from svt_av1_tpu.ops import filter_chain as fc


def main():
    if len(sys.argv) > 1:
        fc.PRI_SET = tuple(int(x) for x in sys.argv[1].split(","))
    if len(sys.argv) > 2:
        fc.SEC_SET = tuple(int(x) for x in sys.argv[2].split(","))
    n_cand = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rng = np.random.default_rng(0)
    fw, fh_px = 1920, 1080
    shapes = [(1088, 1920), (544, 960), (544, 960)]
    vis = ((1920, 1080), (960, 540), (960, 540))
    from svt_av1_tpu.ops import dlf as dlf_ops
    args = []
    for p, (h, w) in enumerate(shapes):
        rec = rng.integers(0, 255, (h, w)).astype(np.uint8)
        vw, vh = vis[p]
        g = (h // 4 + 2, w // 4 + 2)
        tx_w = np.full(g, 16, np.int32)
        tx_h = np.full(g, 16, np.int32)
        skip = np.zeros(g, bool)
        bex = np.ones(g, bool)
        bey = np.ones(g, bool)
        av, fv, ah, fhh = dlf_ops.edge_params(tx_w, tx_h, skip, bex, bey,
                                              vw, vh, p > 0)
        args += [rec, av, fv, ah, fhh]
    srcs = [rng.integers(0, 255, s).astype(np.uint8) for s in shapes]
    ns = np.ones((fh_px // 8 + 1, fw // 8), bool)[: (1088 // 8), :]
    ns = np.ones((1088 // 8, 1920 // 8), bool)
    fn = fc._jit_chain(tuple(s for s in shapes), vis, 0, 8, n_cand,
                       fw, 1088, 3)
    cands = np.asarray([8, 16, 24][:n_cand], np.int32)
    for i in range(3):
        t0 = time.time()
        r = np.asarray(fn(cands, ns, np.int32(3), *srcs, *args))
        print(f"call {i}: {time.time()-t0:.2f}s "
              f"(pri={fc.PRI_SET} sec={fc.SEC_SET} cands={n_cand})")


if __name__ == "__main__":
    main()
