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


_E2E_WORKER = r'''
import hashlib
import sys

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from vnl_tpu.parallel import distributed
distributed.initialize(coordinator_address="127.0.0.1:45137",
                       num_processes=2, process_id=int(sys.argv[1]))
assert jax.process_count() == 2 and jax.device_count() == 4

from vnl_tpu import envs, training

env = envs.get_environment("ant")
metrics_seen = []
make_policy, params, metrics = training.train(
    env, num_timesteps=512, episode_length=8, num_envs=16,
    num_eval_envs=8, learning_rate=3e-4, unroll_length=4, batch_size=8,
    num_minibatches=4, num_updates_per_batch=1, num_evals=2,
    normalize_observations=True, seed=0,
    progress_fn=lambda s, m: metrics_seen.append(m))

# params are replicated: every process must hold bit-identical values
h = hashlib.sha256()
for leaf in jax.tree_util.tree_leaves(params):
    h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
print(f"params_digest {h.hexdigest()}", flush=True)
if jax.process_index() == 0:
    assert "eval/episode_reward" in metrics, metrics
    assert any("training/sps" in m for m in metrics_seen)
print(f"E2E_OK process {jax.process_index()}", flush=True)
'''


def _run_two_process(tmp_path, source, ok_tag, timeout=600):
    script = tmp_path / "worker.py"
    script.write_text(source)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ}) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
    for i, out in enumerate(outs):
        assert f"{ok_tag} process {i}" in out, out[-2000:]
    return outs


@pytest.mark.skipif(os.environ.get("VNL_TPU_SKIP_DIST") == "1",
                    reason="explicitly disabled")
def test_two_process_collectives(tmp_path):
    _run_two_process(tmp_path, _WORKER, "DIST_OK")


@pytest.mark.skipif(os.environ.get("VNL_TPU_SKIP_DIST") == "1",
                    reason="explicitly disabled")
def test_two_process_end_to_end_training(tmp_path):
    """Tiny training.train() across 2 CPU processes (VERDICT r2 #5):
    the per-process env-key folding, collective programs, and process-0
    eval all execute, and both processes finish with bit-identical
    replicated params."""
    outs = _run_two_process(tmp_path, _E2E_WORKER, "E2E_OK", timeout=900)
    digests = []
    for out in outs:
        line = [ln for ln in out.splitlines()
                if ln.startswith("params_digest")]
        assert line, out[-2000:]
        digests.append(line[0].split()[1])
    assert digests[0] == digests[1], digests
