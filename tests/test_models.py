"""Network/distribution tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import models
from vnl_tpu.training import running_statistics


def test_normal_tanh_distribution_consistency(rng):
    dist = models.NormalTanhDistribution(event_size=8)
    logits = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    key = jax.random.PRNGKey(0)
    raw = dist.sample_no_postprocessing(logits, key)
    act = dist.postprocess(raw)
    assert np.all(np.abs(np.asarray(act)) <= 1.0)
    lp = dist.log_prob(logits, raw)
    assert lp.shape == (32,)
    assert np.all(np.isfinite(np.asarray(lp)))
    mode = dist.mode(logits)
    assert np.all(np.abs(np.asarray(mode)) <= 1.0)
    ent = dist.entropy(logits, key)
    assert np.all(np.isfinite(np.asarray(ent)))


def test_log_prob_matches_monte_carlo():
    """log_prob integrates to ~1 over action space (1D sanity check)."""
    dist = models.NormalTanhDistribution(event_size=1)
    logits = jnp.asarray([[0.3, 0.1]])
    xs = jnp.linspace(-6, 6, 20001)[:, None]
    lp = dist.log_prob(jnp.broadcast_to(logits, (len(xs), 2)), xs)
    # integral over raw-action space of exp(lp + log|dtanh|) ... directly:
    # p_raw(x) = exp(log_prob + tanh_log_det) is the Normal pdf, integral 1
    log_det = 2.0 * (jnp.log(2.0) - xs[:, 0] - jax.nn.softplus(-2 * xs[:, 0]))
    p_raw = jnp.exp(lp + log_det)
    integral = jnp.trapezoid(p_raw, xs[:, 0])
    np.testing.assert_allclose(float(integral), 1.0, atol=1e-3)


def test_intention_network_shapes():
    net = models.make_intention_ppo_networks(
        traj_size=795, observation_size=232, action_size=30,
        intention_latent_size=64,
        encoder_layer_sizes=(256, 128), decoder_layer_sizes=(128, 256))
    key = jax.random.PRNGKey(0)
    params = net.policy_network.init(key)
    traj = jnp.zeros((4, 795))
    obs = jnp.zeros((4, 232))
    logits, mean, logvar = net.policy_network.apply(
        None, params, traj, obs, key)
    assert logits.shape == (4, 60)  # 2 * action_size
    assert mean.shape == (4, 64)
    assert logvar.shape == (4, 64)
    vparams = net.value_network.init(key)
    v = net.value_network.apply(None, vparams, obs)
    assert v.shape == (4,)


def test_inference_fn_extras():
    net = models.make_intention_ppo_networks(
        traj_size=16, observation_size=8, action_size=4,
        encoder_layer_sizes=(32,), decoder_layer_sizes=(32,),
        value_hidden_layer_sizes=(32,))
    key = jax.random.PRNGKey(1)
    params = net.policy_network.init(key)
    policy = models.make_inference_fn(net)((None, params))
    action, extras = policy(jnp.zeros(16), jnp.zeros(8), key)
    assert action.shape == (4,)
    assert set(extras) == {"log_prob", "rand_log_prob", "raw_action", "logits"}
    det_policy = models.make_inference_fn(net)((None, params),
                                               deterministic=True)
    action2, extras2 = det_policy(jnp.zeros(16), jnp.zeros(8), key)
    assert extras2 == {}


def test_running_statistics_welford(rng):
    state = running_statistics.init_state((5,))
    data = rng.normal(loc=3.0, scale=2.0, size=(1000, 5)).astype(np.float32)
    for chunk in np.split(data, 10):
        state = running_statistics.update(state, jnp.asarray(chunk))
    np.testing.assert_allclose(np.asarray(state.mean), data.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.std), data.std(0), atol=1e-2)
    normed = running_statistics.normalize(jnp.asarray(data), state)
    np.testing.assert_allclose(np.asarray(normed).mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(normed).std(0), 1.0, atol=1e-2)


def test_running_statistics_psum_equivalence(rng):
    """Sharded update over 8 devices == single-device update."""
    data = rng.normal(size=(64, 3)).astype(np.float32)
    state = running_statistics.init_state((3,))
    ref = running_statistics.update(state, jnp.asarray(data))

    import numpy as _np
    from jax.sharding import Mesh, PartitionSpec as P
    from vnl_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.create_mesh(8)

    def f(state, batch):
        return running_statistics.update(state, batch, axis_name="data")

    sharded_update = jax.jit(mesh_lib.shard_map_fn(
        f, mesh, in_specs=(P(), P("data")), out_specs=P()))
    got = sharded_update(state, jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.std), np.asarray(ref.std),
                               atol=1e-5)


def test_gae_matches_reference_formula(rng):
    from vnl_tpu.training import losses
    T, B = 10, 4
    rewards = jnp.asarray(rng.normal(size=(T, B)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(T, B)), jnp.float32)
    bootstrap = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    term = jnp.zeros((T, B))
    trunc = jnp.zeros((T, B))
    vs, adv = losses.compute_gae(trunc, term, rewards, values, bootstrap,
                                 lambda_=0.95, discount=0.99)
    # numpy reference
    vals = np.concatenate([np.asarray(values), np.asarray(bootstrap)[None]], 0)
    deltas = np.asarray(rewards) + 0.99 * vals[1:] - vals[:-1]
    acc = np.zeros(B)
    out = np.zeros((T, B))
    for t in reversed(range(T)):
        acc = deltas[t] + 0.99 * 0.95 * acc
        out[t] = acc
    np.testing.assert_allclose(np.asarray(vs), out + np.asarray(values),
                               atol=1e-4)
