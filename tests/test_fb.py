"""FB stack tests: network forward parity against the reference's torch
modules (executed, weights imported), agent training loop, checkpointing."""
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.fb.agent import FBResearchAgent
from raytracer_tpu.fb.config import FBConfig
from raytracer_tpu.fb.networks import (BackwardModel, Encoder, ForwardModel,
                                       SimpleBackwardModel, SimpleEncoder,
                                       SimpleForwardModel)
from raytracer_tpu.utils import torch_import as ti

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    """Import the reference comparison module (executes class definitions
    with real torch; matplotlib/tqdm are present in the image)."""
    sys.path.insert(0, "/root/reference/RL")
    spec = importlib.util.spec_from_file_location(
        "ref_chand", "/root/reference/FB/fb_vs_traditional_chandelier.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_enhanced_encoder_parity(ref_mod):
    torch.manual_seed(0)
    tenc = ref_mod.EnhancedEncoder(obs_dim=22, z_dim=64, hidden_dim=512)
    tenc.eval()
    x = np.random.default_rng(0).normal(size=(8, 22)).astype(np.float32)
    with torch.no_grad():
        ref = tenc(torch.from_numpy(x)).numpy()

    enc = Encoder(z_dim=64, hidden_dim=512)
    params = ti.import_enhanced_encoder(
        {k: v.numpy() for k, v in tenc.state_dict().items()})
    out = enc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_enhanced_forward_parity(ref_mod):
    torch.manual_seed(1)
    tf = ref_mod.EnhancedForwardModel(z_dim=64, action_dim=2, hidden_dim=512,
                                      num_heads=3, num_layers=2)
    tf.eval()
    rng = np.random.default_rng(1)
    z = rng.normal(size=(8, 64)).astype(np.float32)
    a = rng.normal(size=(8, 2)).astype(np.float32)
    with torch.no_grad():
        ref = tf(torch.from_numpy(z), torch.from_numpy(a))

    fwd = ForwardModel(z_dim=64, action_dim=2, hidden_dim=512, num_heads=3,
                       num_layers=2)
    params = ti.import_enhanced_forward(
        {k: v.numpy() for k, v in tf.state_dict().items()}, 3, 2)
    out = fwd.apply({"params": params}, jnp.asarray(z), jnp.asarray(a))
    for (rm, rlv), (m, lv) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(m), rm.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(lv), rlv.numpy(), atol=2e-4)


def test_enhanced_backward_parity(ref_mod):
    torch.manual_seed(2)
    tb = ref_mod.EnhancedBackwardModel(z_dim=64, action_dim=2, hidden_dim=256,
                                       num_layers=2)
    tb.eval()
    rng = np.random.default_rng(2)
    zt = rng.normal(size=(8, 64)).astype(np.float32)
    zn = rng.normal(size=(8, 64)).astype(np.float32)
    with torch.no_grad():
        rm, rlv = tb(torch.from_numpy(zt), torch.from_numpy(zn))

    bwd = BackwardModel(z_dim=64, action_dim=2, hidden_dim=256, num_layers=2)
    params = ti.import_enhanced_backward(
        {k: v.numpy() for k, v in tb.state_dict().items()}, 2)
    m, lv = bwd.apply({"params": params}, jnp.asarray(zt), jnp.asarray(zn))
    np.testing.assert_allclose(np.asarray(m), rm.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv), rlv.numpy(), atol=2e-4)


def test_simple_checkpoint_import():
    """The surviving fb_model_simple.pth loads and runs through the
    reconstructed simple network family."""
    ck = ti.load_torch_checkpoint("/root/reference/fb_model_simple.pth")
    enc_p = ti.import_simple_encoder(ck["encoder"])
    fwd_p = ti.import_simple_forward(ck["forward_model"], num_heads=2)
    bwd_p = ti.import_simple_backward(ck["backward_model"])

    enc = SimpleEncoder(z_dim=32, hidden_dim=128)
    fwd = SimpleForwardModel(z_dim=32, hidden_dim=128, num_heads=2)
    bwd = SimpleBackwardModel(hidden_dim=64)
    rng = np.random.default_rng(3)
    obs = jnp.asarray(rng.normal(size=(4, 22)).astype(np.float32))
    out = enc.apply({"params": enc_p}, obs)
    assert out.shape == (4, 64)
    z, _ = jnp.split(out, 2, axis=-1)
    preds = fwd.apply({"params": fwd_p}, z,
                      jnp.zeros((4, 2), jnp.float32))
    assert len(preds) == 2 and preds[0].shape == (4, 32)
    act = bwd.apply({"params": bwd_p}, z, z)
    a = np.asarray(act)
    assert a.shape == (4, 2) and (np.abs(a) <= 1.0).all()


def test_agent_learns_and_checkpoints(tmp_path):
    cfg = FBConfig(z_dim=16, e_hidden_dim=64, f_hidden_dim=64,
                   b_hidden_dim=32, batch_size=32, update_freq=16,
                   buffer_capacity=1000)
    agent = FBResearchAgent(cfg, seed=0)
    rng = np.random.default_rng(0)
    for i in range(8):
        obs = rng.normal(size=(16, 22)).astype(np.float32)
        nxt = rng.normal(size=(16, 22)).astype(np.float32)
        act = rng.uniform(-1, 1, size=(16, 2)).astype(np.float32)
        rew = (rng.uniform(size=16) < 0.3).astype(np.float32)
        agent.record_success(obs, act, nxt, rew, rew)
    assert agent.updates >= 1
    assert len(agent.light_memory) > 0
    assert all(np.isfinite(l) for l in agent.losses)

    a, info = agent.choose_direction_research(np.zeros(22, np.float32))
    assert a.shape == (2,) and (np.abs(a) <= 1.0).all()
    assert info["strategy"] == "fb_guided"

    # Checkpoint roundtrip.
    p = tmp_path / "fb_ck.npz"
    agent.save(p)
    agent2 = FBResearchAgent(cfg, seed=99)
    agent2.load(p)
    obs = jnp.asarray(rng.normal(size=(4, 22)).astype(np.float32))
    a1 = agent.choose_direction_batch(obs)
    a2 = agent2.choose_direction_batch(obs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_loss_decreases_on_learnable_mapping():
    """On a fixed deterministic transition structure the total loss should
    trend down — sanity that gradients flow through all three nets."""
    cfg = FBConfig(z_dim=8, e_hidden_dim=32, f_hidden_dim=32, b_hidden_dim=16,
                   batch_size=64, update_freq=10**9, learning_rate=1e-3,
                   buffer_capacity=10_000)
    agent = FBResearchAgent(cfg, seed=0)
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(512, 22)).astype(np.float32)
    act = rng.uniform(-1, 1, size=(512, 2)).astype(np.float32)
    nxt = np.roll(obs, 1, axis=1) + 0.1 * np.concatenate(
        [act, np.zeros((512, 20), np.float32)], axis=1)
    agent.buffer.add(obs, act, nxt, np.zeros(512), np.zeros(512))
    first = agent.train_step()
    for _ in range(30):
        last = agent.train_step()
    assert last < first
