"""Multi-process (multi-host analogue) collectives: 2 CPU processes.

SURVEY.md §4 calls out that the reference has no way to test multi-node
without a cluster; here a 2-process CPU mesh (jax.distributed + Gloo)
validates the cross-process path the TPU-pod deployment uses: global mesh
construction, psum'd running statistics, and pmean'd gradients.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r'''
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from vnl_tpu.parallel import distributed
distributed.initialize(coordinator_address="127.0.0.1:45129",
                       num_processes=2, process_id=int(sys.argv[1]))
assert jax.process_count() == 2
assert jax.device_count() == 2

from jax.sharding import NamedSharding, PartitionSpec as P
from vnl_tpu.parallel import mesh as mesh_lib
from vnl_tpu.training import running_statistics

mesh = mesh_lib.create_mesh()
pid = jax.process_index()

# each process contributes a distinct batch; stats must be identical and
# equal to the stats of the concatenated data on every process
local = np.full((4, 3), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local)
state = running_statistics.init_state((3,))
update = jax.jit(mesh_lib.shard_map_fn(
    lambda s, b: running_statistics.update(s, b, axis_name="data"),
    mesh, in_specs=(P(), P("data")), out_specs=P()))
state = update(state, arr)
mean = float(np.asarray(state.mean)[0])
count = float(np.asarray(state.count))
assert abs(mean - 1.5) < 1e-5, mean   # mean of [1]*4 + [2]*4
assert count == 8.0, count

# gradient pmean across processes
from vnl_tpu.training import gradients
import optax
opt = optax.sgd(0.1)
params = {"w": np.ones(2, np.float32) * (pid + 1.0)}  # deliberately differ
f = gradients.gradient_update_fn(
    lambda p: (p["w"] ** 2).sum(), opt, axis_name="data")

def run(p):
    return f(p, optimizer_state=opt.init(p))

g = jax.jit(mesh_lib.shard_map_fn(
    lambda p: run(p)[1], mesh, in_specs=P(), out_specs=P()))
# replicated params must produce identical updates on both processes
same = {"w": np.ones(2, np.float32)}
out = g(same)
np.testing.assert_allclose(np.asarray(out["w"]), 0.8, atol=1e-6)
print(f"DIST_OK process {pid}", flush=True)
'''


@pytest.mark.skipif(os.environ.get("VNL_TPU_SKIP_DIST") == "1",
                    reason="explicitly disabled")
def test_two_process_collectives(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ}) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, out in enumerate(outs):
        assert f"DIST_OK process {i}" in out, out[-2000:]
