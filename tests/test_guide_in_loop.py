"""Guide-in-the-loop experience generation (fb/trajectory.py): the policy
drives a fraction of walk steps, the unguided stream is untouched."""
import jax
import jax.numpy as jnp
import numpy as np


def _setup():
    from raytracer_tpu.fb.config import FBConfig
    from raytracer_tpu.fb.trainer import ChandelierOnlyTrainer

    # Small network config: the guided walk compiles the policy into the
    # scan body; 512-wide would cost minutes of CPU compile in CI.
    cfg = FBConfig(z_dim=16, e_hidden_dim=64, f_hidden_dim=64,
                   b_hidden_dim=64, batch_size=64)
    tr = ChandelierOnlyTrainer(num_training_scenes=1, config=cfg,
                               output_dir="/tmp/_gil_unit", guide_prob=0.5)
    tr.agent.light_memory.append(np.ones(tr.config.z_dim, np.float32))
    scene, name, _ = tr.make_scene(0)
    return tr, scene, name


def test_guided_walk_differs_and_unguided_stream_is_unchanged():
    from raytracer_tpu.fb.trajectory import generate_trajectories

    tr, scene, _ = _setup()
    k = jax.random.key(3)
    kw = dict(num_walkers=32, max_steps=4, start_bias="small")
    b0 = generate_trajectories(scene, k, **kw)
    b0_again = generate_trajectories(scene, k, **kw)
    bg = generate_trajectories(
        scene, k, guide_apply=tr.agent.guide_apply,
        guide_params=tr.agent.params,
        guide_proto=jnp.asarray(tr.agent.light_prototype()),
        guide_prob=1.0, guide_noise=0.05, **kw)
    # Unguided key schedule untouched (k2 branch only consumed when guided).
    np.testing.assert_array_equal(np.asarray(b0.action),
                                  np.asarray(b0_again.action))
    assert not np.allclose(np.asarray(b0.action), np.asarray(bg.action))
    # Guided actions are the recorded actions (what the buffer must learn).
    assert np.abs(np.asarray(bg.action)).max() <= 1.0
    assert bool(np.asarray(bg.valid).any())


def test_trainer_engages_guide_only_with_prototype():
    tr, scene, name = _setup()
    tr.agent.light_memory.clear()
    r = tr.train_on_scene(scene, name, episodes=32)   # no prototype → walk
    assert 0.0 <= r <= 1.0
    tr.agent.light_memory.append(np.ones(tr.config.z_dim, np.float32))
    r2 = tr.train_on_scene(scene, name, episodes=32)  # guided path runs
    assert 0.0 <= r2 <= 1.0
    assert tr.agent.buffer.size > 0
