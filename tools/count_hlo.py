"""Counts optimized-HLO ops for the jitted rodent physics step.

The engine is op-count-bound on TPU (~5us dispatch per non-fused op), so
this is the real perf currency: run before/after any fusion change.
Usage: python tools/count_hlo.py [batch]
"""
import collections
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import importlib

from vnl_tpu.mjcf import load_model

# the module is shadowed by the same-named function in the package namespace
fwd = importlib.import_module("vnl_tpu.physics.forward")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def entry_ops(fn, batch):
    hlo = jax.jit(jax.vmap(fn)).lower(batch).compile().as_text()
    ops = collections.Counter()
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        mo = re.match(r"(?:ROOT )?%?[\w.\-]+ = \S+ ([a-z\-]+)\(", line.strip())
        if mo:
            ops[mo.group(1)] += 1
    return ops


def main():
    m = load_model("/root/reference/assets/rodent.xml")
    d0 = fwd.make_data(m)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)

    from vnl_tpu.physics import collision as _col
    from vnl_tpu.physics import constraint as _con
    from vnl_tpu.physics import rne as _rne
    import vnl_tpu.physics.inertia as _inr
    kin = importlib.import_module("vnl_tpu.physics.kinematics")

    def pos_stage(d):
        dd, efc = fwd.fwd_position(m, d)
        return dd, efc.J if hasattr(efc, "J") else 0

    stages = {
        "kinematics": lambda d: kin.kinematics(m, d),
        "+com_pos": lambda d: kin.com_pos(m, kin.kinematics(m, d)),
        "+crb(inv_spd)": lambda d: _inr.crb(
            m, kin.com_pos(m, kin.kinematics(m, d))),
        "fwd_position(all)": pos_stage,
        "forward": lambda d: fwd.forward(m, d),
        "step": lambda d: fwd.step(m, d),
    }
    prev = 0
    for name, fn in stages.items():
        ops = entry_ops(fn, batch)
        total = sum(ops.values())
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(4))
        print(f"{name:20s} kernels={total:5d} (+{total - prev:5d})  [{top}]",
              flush=True)
        prev = total


if __name__ == "__main__":
    main()
