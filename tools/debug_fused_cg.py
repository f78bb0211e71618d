"""Locate the fused-CG TPU disagreement: grid=1 vs grid=8, per-row stats.

Compares the pallas kernel against the per-env XLA reference on identical
flat inputs, at B=128 (grid=1) and B=1024 (grid=8).
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import mjcf, physics

smod = importlib.import_module("vnl_tpu.physics.solver")
nmod = importlib.import_module("vnl_tpu.physics.constraint")
cmod = importlib.import_module("vnl_tpu.physics.collision")
pcg = importlib.import_module("vnl_tpu.ops.pallas_cg")

m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})
B = 1024
rng = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(rng)
qpos = jnp.tile(m.qpos0[None], (B, 1))
qpos = qpos.at[:, 2].add(-0.005)
qpos = qpos.at[:, 7:].add(0.05 * jax.random.normal(k1, (B, m.nq - 7)))
qvel = 0.3 * jax.random.normal(k2, (B, m.nv))
d = jax.vmap(lambda q, v: physics.make_data(m, qpos=q, qvel=v))(qpos, qvel)
d = jax.jit(jax.vmap(lambda x: physics.forward(m, x)))(d)
jax.block_until_ready(d)
print("setup done", flush=True)


def flat_args(d0):
    dist, pos, frame, pair = cmod.collide(m, d0)
    efc = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                materialize_jc=False)
    g36 = jnp.concatenate([
        efc.con_G2.transpose(1, 2, 0).reshape(18, efc.ncon),
        efc.con_G1.transpose(1, 2, 0).reshape(18, efc.ncon)], axis=0)
    return efc, (d0.qM, d0.qMinv, d0.qacc_smooth, efc.con_cdof, g36,
                 efc.lim_sign, efc.lim_aref, efc.lim_D, efc.con_mu,
                 efc.con_aref, efc.con_D)


d0 = jax.tree.map(lambda x: x[0], d)
efc0, _ = flat_args(d0)
batched = jax.jit(jax.vmap(lambda dd: flat_args(dd)[1]))(d)
jax.block_until_ready(batched)
print("args done", flush=True)

ref = smod._make_cg_reference(m.nv, efc0.ncon, efc0.nlimit, 6, 6,
                              np.asarray(efc0.lim_dof),
                              efc0.con_chain1, efc0.con_chain2)
fused = pcg.make_cg_fused(m.nv, efc0.ncon, efc0.nlimit, 6, 6,
                          np.asarray(efc0.lim_dof), efc0.con_chain1,
                          efc0.con_chain2, ref, interpret=False)

out_ref = jax.jit(jax.vmap(ref))(*batched)
jax.block_until_ready(out_ref)
print("ref done", flush=True)

# the XLA path's einsums run at TPU default (bf16) precision — compare
# against a pinned-f32 evaluation to see which side carries the noise
def ref_hi(*a):
    with jax.default_matmul_precision("float32"):
        return ref(*a)

out_hi = jax.jit(jax.vmap(ref_hi))(*batched)
jax.block_until_ready(out_hi)
qa_d = np.abs(np.asarray(out_ref[0]) - np.asarray(out_hi[0]))
rel_d = qa_d / (np.abs(np.asarray(out_hi[0])) + 1.0)
print(f"XLA default-vs-f32 ref: relish max={rel_d.max():.3e} "
      f"mean={rel_d.mean():.3e}", flush=True)
out_ref = out_hi

for nb in (128, 1024):
    sub = tuple(a[:nb] for a in batched)
    out_pal = jax.jit(jax.vmap(fused))(*sub)
    jax.block_until_ready(out_pal)
    qa_r = np.asarray(out_ref[0][:nb])
    qa_p = np.asarray(out_pal[0])
    diff = np.abs(qa_r - qa_p) / (np.abs(qa_r) + 1.0)
    print(f"B={nb}: qacc relish max={diff.max():.3e} "
          f"mean={diff.mean():.3e}", flush=True)
    bad_env = diff.max(axis=1)
    print(f"  envs >1e-2: {int((bad_env > 1e-2).sum())}/{nb}; "
          f"worst env {int(bad_env.argmax())}", flush=True)
    per_block = [float(diff[i * 128:(i + 1) * 128].max())
                 for i in range(nb // 128)]
    print("  per-128-block max:", ["%.1e" % v for v in per_block],
          flush=True)
    w = int(bad_env.argmax())
    print("  worst env ref[:8] ", qa_r[w][:8], flush=True)
    print("  worst env pal[:8] ", qa_p[w][:8], flush=True)
