"""Fine-grained split of fwd_position's post-kernel block (round-4 probe).

The round-3/4 ablation shows position kernel 1.4 ms and "+inv,col,efc"
+2.0 ms at B=1024.  This separates that 2.0 ms into: mass-matrix sweep
inverse (inv_spd_fused of the stacked [qM, M+hB]), narrowphase collide,
and constraint-row assembly.

Usage: python tools/ablate_position_block.py [B]
"""

import importlib
import sys
import time

import jax
import jax.numpy as jnp

from vnl_tpu import mjcf, physics

fmod = importlib.import_module("vnl_tpu.physics.forward")
imod = importlib.import_module("vnl_tpu.physics.inertia")
cmod = importlib.import_module("vnl_tpu.physics.collision")
nmod = importlib.import_module("vnl_tpu.physics.constraint")
pp = importlib.import_module("vnl_tpu.ops.pallas_position")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
qpos = jnp.tile(m.qpos0[None], (B, 1)).at[:, 2].add(-0.005)
qpos = qpos.at[:, 7:].add(0.05 * jax.random.normal(k1, (B, m.nq - 7)))
qvel = 0.3 * jax.random.normal(k2, (B, m.nv))
d0 = jax.vmap(lambda q, v: physics.make_data(m, qpos=q, qvel=v))(qpos, qvel)
d0 = jax.jit(jax.vmap(lambda d: physics.forward(m, d)))(d0)
jax.block_until_ready(d0)
print("setup done", flush=True)

fused = pp.make_position_fused(m, fmod._position_reference(m)[1],
                               interpret=jax.default_backend() != "tpu")


def apply_kernel(d):
    (xpos, xquat, xmat, xipos, xanchor, xaxis, gxp, gxm, scom,
     cinert, cdof, qM, *invs) = fused(d.qpos)
    return d.replace(xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
                     xanchor=xanchor, xaxis=xaxis, geom_xpos=gxp,
                     geom_xmat=gxm, subtree_com=scom, cinert=cinert,
                     cdof=cdof, qM=qM, qMinv=invs[0],
                     qMhBinv=invs[1] if len(invs) > 1 else invs[0])


def s_kernel(dd):
    return apply_kernel(dd)


def s_inv(dd):
    # historical stage: the sweep inverse now rides inside the kernel, so
    # the marginal here should be ~0
    return apply_kernel(dd)


def s_collide(dd):
    dd = apply_kernel(dd)
    con_dist, con_pos, con_frame, con_pair = cmod.collide(m, dd)
    return dd.replace(contact_dist=con_dist, contact_pos=con_pos,
                      contact_frame=con_frame)


def s_efc(dd):
    dd, efc = fmod.fwd_position(m, dd)
    return dd, jax.tree.leaves(efc)


def timeit(tag, f, prev, iters=30):
    g = jax.jit(jax.vmap(f))
    out = g(d0)
    jax.block_until_ready(out)
    out = g(d0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(d0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s} {dt*1e3:7.2f} ms  (marginal {(dt-prev)*1e3:+6.2f} ms)",
          flush=True)
    return dt


prev = 0.0
for tag, f in [("kernel", s_kernel), ("kernel+inv", s_inv),
               ("kernel+inv+collide", s_collide),
               ("full fwd_position (+efc)", s_efc)]:
    with jax.default_matmul_precision(fmod._matmul_precision()):
        prev = timeit(tag, f, prev)
