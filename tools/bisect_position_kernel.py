"""Bisect the position megakernel's fixed cost (round-5, VERDICT r4 #1a).

Times each stage-cap variant of ops/pallas_position with relay-proof
methodology: ITERS kernel invocations are CHAINED inside one jit program
(q <- q + 1e-30 * sum(xpos) forces a data dependency), and the program is
timed by a VALUE readback of one scalar — block_until_ready does not wait
through the axon relay (CLAUDE.md round-4).

Stages: 0 FK+extract | 1 +geom/scom | 2 +cinert | 3 +crb/cdof | 4 +qM
        | 5 +qMinv sweep | 6/full +qMhBinv sweep.

Usage: python tools/bisect_position_kernel.py [B] [ITERS] [caps]
  caps: comma list, e.g. "0,full" (default "0,1,2,3,4,5,full")
"""

import importlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import mjcf

fmod = importlib.import_module("vnl_tpu.physics.forward")
pp = importlib.import_module("vnl_tpu.ops.pallas_position")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})
ref_fn = fmod._position_reference(m)[1]

st = pp._statics(m)
packed, _ = pp._pack(st)
tbl_bytes = sum(np.asarray(st[k]).nbytes for k in pp._BIG) + sum(
    packed[g].nbytes for g in pp._PACK)
print(f"model: nb={m.nbody} nj={m.njnt} nv={m.nv} nq={m.nq} "
      f"ngeom={m.ngeom} static tables {tbl_bytes/1e6:.2f} MB "
      f"grid={B // pp._BLOCK}", flush=True)

k1 = jax.random.PRNGKey(0)
qpos = jnp.tile(jnp.asarray(m.qpos0)[None], (B, 1))
qpos = qpos.at[:, 7:].add(
    0.05 * jax.random.normal(k1, (B, m.nq - 7), jnp.float32))

caps = [None if c == "full" else int(c) for c in
        (sys.argv[3].split(",") if len(sys.argv) > 3
         else ["0", "1", "2", "3", "4", "5", "full"])]
results = {}
for cap in caps:
    fused = pp.make_position_fused(m, ref_fn, stage_cap=cap)

    @jax.jit
    def prog(q, fused=fused):
        def body(q, _):
            outs = jax.vmap(fused)(q)
            return q + 1e-30 * jnp.sum(outs[0]), ()
        q, _ = jax.lax.scan(body, q, None, length=ITERS)
        return q[0, 0]

    with jax.default_matmul_precision(fmod._matmul_precision()):
        t0 = time.perf_counter()
        float(prog(qpos))          # compile + run
        t_compile = time.perf_counter() - t0
        float(prog(qpos))          # warm (relayout recompiles)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(qpos))      # value readback forces execution
            best = min(best, time.perf_counter() - t0)
    per = best / ITERS * 1e3
    tag = "full" if cap is None else f"cap={cap}"
    prevcap = {0: None, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4, None: 5}[cap]
    marg = per - results.get(prevcap, (0.0,))[0]
    results[cap] = (per, marg)
    print(f"{tag:7s} {per:7.3f} ms/call  (marginal {marg:+6.3f} ms)  "
          f"[compile {t_compile:.0f}s]", flush=True)
