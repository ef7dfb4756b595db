"""SB3 ``.zip`` checkpoint → native flax policy weights.

The reference's trained-model workflow revolves around stable-baselines3
zip archives: saved at RL/train_raytracer.py:150-151 and reloaded with
``SAC.load(...)`` at RL/use_trained_model.py:107.  This module reads those
archives directly (zipfile + torch.load on the contained ``policy.pth``)
and converts the state dict into the parameter trees of our native
``SACActor``/``SACCritic``/``PPOActorCritic`` (agents/networks.py), so a
user's existing SB3 checkpoints keep working without stable-baselines3
installed.

Weight layout: torch ``nn.Linear`` stores ``weight[out, in]``; flax
``nn.Dense`` stores ``kernel[in, out]`` — every kernel is the transpose.

Action semantics reproduced at predict time (tested against a from-scratch
torch oracle in tests/test_sb3_import.py):

* SAC ("MlpPolicy", squashed Gaussian): deterministic action =
  ``unscale(tanh(mu(latent_pi(obs))))`` with
  ``unscale(a) = low + 0.5*(a+1)*(high-low)`` — exactly our
  ``SACTrainer.predict``'s ``mid + scale * tanh(u)``.
* PPO ("MlpPolicy", diagonal Gaussian, no squash): deterministic action =
  ``clip(action_net(policy_net(obs)), low, high)`` — exactly our
  ``PPOTrainer.predict``.
"""
from __future__ import annotations

import io
import json
import zipfile
from typing import Dict, Tuple

import numpy as np


def load_sb3_zip(path: str) -> Dict:
    """Read an SB3 save archive: policy state dict (numpy) + metadata.

    Returns ``{"policy": {name: np.ndarray}, "data": dict, "version": str}``.
    ``data`` is the hyperparameter JSON (spaces left serialized — only the
    plain fields like low/high reprs are needed here).
    """
    import torch

    out = {"policy": {}, "data": {}, "version": ""}
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        if "policy.pth" not in names:
            raise ValueError(f"{path}: not an SB3 archive (no policy.pth)")
        sd = torch.load(io.BytesIO(z.read("policy.pth")),
                        map_location="cpu", weights_only=False)
        out["policy"] = {k: np.asarray(v.detach().numpy(), np.float32)
                         for k, v in sd.items()}
        if "data" in names:
            out["data"] = json.loads(z.read("data").decode())
        if "_stable_baselines3_version" in names:
            out["version"] = z.read("_stable_baselines3_version").decode()
    return out


def _dense(sd: Dict, torch_name: str) -> Dict:
    return {"kernel": sd[f"{torch_name}.weight"].T.copy(),
            "bias": sd[f"{torch_name}.bias"].copy()}


def action_bounds(data: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """Action-space low/high from the archive's metadata JSON (the reprs
    SB3 stores alongside the cloudpickled space)."""
    space = data.get("action_space", {})
    low = np.fromstring(space["low"].strip("[]"), sep=" ", dtype=np.float32) \
        if isinstance(space.get("low"), str) else None
    high = np.fromstring(space["high"].strip("[]"), sep=" ",
                         dtype=np.float32) \
        if isinstance(space.get("high"), str) else None
    if low is None or high is None or low.size == 0 or high.size == 0:
        raise ValueError("SB3 archive metadata has no parseable action "
                         "space bounds")
    return low, high


def import_sac_policy(sd: Dict) -> Dict:
    """SB3 SAC ``policy.pth`` state dict → flax trees.

    Returns ``{"actor": ..., "critic": ..., "target_critic": ...}`` matching
    ``SACActor``/``SACCritic`` (agents/networks.py: Dense_0=μ head,
    Dense_1=log_std head, MLP_0=latent_pi trunk; critic MLP_i/Dense_i =
    qf{i} trunk/head).
    """
    n_trunk = len([k for k in sd if k.startswith("actor.latent_pi.")
                   and k.endswith(".weight")])
    actor = {
        "MLP_0": {f"Dense_{i}": _dense(sd, f"actor.latent_pi.{2 * i}")
                  for i in range(n_trunk)},
        "Dense_0": _dense(sd, "actor.mu"),
        "Dense_1": _dense(sd, "actor.log_std"),
    }

    def critic_tree(prefix: str) -> Dict:
        tree = {}
        for q in (0, 1):
            layers = sorted({int(k.split(".")[2]) for k in sd
                             if k.startswith(f"{prefix}.qf{q}.")
                             and k.endswith(".weight")})
            trunk, head = layers[:-1], layers[-1]
            tree[f"MLP_{q}"] = {
                f"Dense_{i}": _dense(sd, f"{prefix}.qf{q}.{l}")
                for i, l in enumerate(trunk)}
            tree[f"Dense_{q}"] = _dense(sd, f"{prefix}.qf{q}.{head}")
        return tree

    return {"actor": actor, "critic": critic_tree("critic"),
            "target_critic": critic_tree("critic_target")}


def import_ppo_policy(sd: Dict) -> Dict:
    """SB3 PPO ``policy.pth`` state dict → ``PPOActorCritic`` param tree
    (MLP_0=policy trunk, Dense_0=action head, MLP_1=value trunk,
    Dense_1=value head, log_std)."""
    def trunk(prefix: str) -> Dict:
        layers = sorted({int(k.split(".")[-2]) for k in sd
                         if k.startswith(prefix) and k.endswith(".weight")})
        return {f"Dense_{i}": _dense(sd, f"{prefix}.{l}")
                for i, l in enumerate(layers)}

    return {
        "MLP_0": trunk("mlp_extractor.policy_net"),
        "Dense_0": _dense(sd, "action_net"),
        "MLP_1": trunk("mlp_extractor.value_net"),
        "Dense_1": _dense(sd, "value_net"),
        "log_std": sd["log_std"].copy(),
    }
