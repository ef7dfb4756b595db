"""Policy distillation: trained FB agent → tiny deployment guide.

The trained FB stack (512-wide encoder + 256-wide backward model,
fb/networks.py) costs ~437k MACs per guided ray per bounce — measured
65 ms/frame even in bf16 at the chandelier comparison config, which is most
of the FB renderer's wall-clock gap to traditional sampling (the
reference's core failure mode: its per-ray CPU inference lost 6.7×,
chandelier_comparison_20260217_210620/statistics.json speedup 0.149).

For *inference* the policy is just ``obs[22] → action[2]`` with a fixed
light prototype baked in, so we distil it into a 64-wide student MLP
(~5.6k MACs, ~80× cheaper) trained to match the teacher's actions on the
observation distribution the renderer actually visits (collected from
guided render wavefronts) plus jittered copies for coverage.  The student
is exact enough to keep the teacher's light-hit improvement (pinned in
tests/test_distill.py) while making the guide's cost ~vanish.

This has no reference counterpart — it is the deployment answer to the
reference's "FB inference is 6.7× slower" problem.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..scene.types import Scene


class StudentPolicy(nn.Module):
    hidden: Tuple[int, ...] = (64, 64)
    action_dim: int = 2

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.action_dim)(x)


def collect_observations(scene: Scene, guide_fn, key: jax.Array, *,
                         width: int = 128, height: int = 64, spp: int = 4,
                         max_bounces: int = 8, frames: int = 4,
                         camera_position=(0.0, 2.0, 0.0),
                         mirror_threshold: float = 0.9) -> np.ndarray:
    """Observation wavefronts from guided renders — the on-path obs
    distribution the deployed guide will see.  Mirrors the stepwise trace
    loop (trace/path.py) and records each level's diffuse-lane obs.

    NB the frame's ASPECT RATIO selects which scene regions the camera
    paths visit, so ``distill_agent`` collects at both deployment aspects
    (2:1 and 4:3).  Coverage alone does not fix off-region skill, though:
    the student can only copy what the teacher knows, and a teacher whose
    walk starts under-sample the giant wall spheres aims poorly from wall
    surface points (measured: 2.8-3.2× small-light improvement at the 2:1
    reference config vs <1× at 800×600 4:3, where more wall/floor area is
    visible).  Broader teacher start-point coverage is the real lever."""
    from ..core import vec
    from ..render.path_renderer import _camera_bundle
    from ..trace.path import _apply_guide, _level_kernel

    out = []
    cam = jnp.asarray(camera_position, jnp.float32)
    for f in range(frames):
        key, kf, kt = jax.random.split(key, 3)
        o, d = _camera_bundle(kf, width=width, height=height, spp=spp,
                              fov=60.0, camera_position=cam)
        d = vec.normalise_safe(d)
        running = jnp.ones((o.shape[0],), bool)
        keys = jax.random.split(kt, max_bounces)
        for lvl in range(max_bounces):
            (o, d, running, _state, _alb, _dir, obs, diffuse, fb_u,
             normal, _stats) = _level_kernel(
                scene, o, d, running, keys[lvl],
                jnp.asarray(float(lvl), jnp.float32),
                max_bounces=max_bounces, mirror_threshold=mirror_threshold,
                want_obs=True)
            action = guide_fn(obs)
            d = _apply_guide(action, normal, diffuse, d, diffuse)
            mask = np.asarray(diffuse)
            if mask.any():
                out.append(np.asarray(obs)[mask])
    return np.concatenate(out) if out else np.zeros((0, 22), np.float32)


@dataclasses.dataclass
class DistillResult:
    params: dict
    hidden: Tuple[int, ...]
    final_loss: float
    n_obs: int


@partial(jax.jit, static_argnames=("apply_fn", "tx"))
def _distill_step(params, opt_state, obs, target, weight, *, apply_fn, tx):
    def loss_fn(p):
        pred = apply_fn({"params": p}, obs)
        se = jnp.sum((pred - target) ** 2, axis=-1)
        return jnp.sum(weight * se) / jnp.maximum(jnp.sum(weight), 1e-9)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def _chunked(fn, arr, chunk=1 << 19):
    """Apply ``fn`` over row chunks (bounds the activation footprint — the
    teacher forward on millions of obs at 512-wide would exceed HBM)."""
    outs = [np.asarray(fn(jnp.asarray(arr[i:i + chunk])))
            for i in range(0, arr.shape[0], chunk)]
    return np.concatenate(outs)


def _action_outcomes(scene: Scene, obs: np.ndarray, actions: np.ndarray,
                     *, small_radius_below: float = 0.5):
    """Shoot each action from its obs's surface point; return
    ``(emis, small)`` boolean arrays — did the ray land on an emissive
    sphere / on a *small* emissive sphere (the deployment metric)."""
    from ..core.intersect import NO_SUPPRESS, nearest_hit, take_small
    from ..trace import sampling

    def shoot(args):
        o, a = args
        point, normal = o[:, 0:3], o[:, 6:9]
        direction = sampling.fb_action_to_direction(
            jnp.clip(a, -1.0, 1.0), normal, "renderer")
        hit = nearest_hit(point + normal * 0.001, direction, scene,
                          jnp.full(o.shape[:1], NO_SUPPRESS, jnp.int32),
                          by_abs=True)
        emis = hit.found & (take_small(scene.emitive, hit.idx) > 0)
        small = emis & (take_small(scene.radius, hit.idx)
                        < small_radius_below)
        return emis, small

    shoot_j = jax.jit(shoot)          # one jit; chunks share the compile
    chunk = 1 << 19
    emis_out, small_out = [], []
    for i in range(0, obs.shape[0], chunk):
        e, s = shoot_j((jnp.asarray(obs[i:i + chunk]),
                        jnp.asarray(actions[i:i + chunk])))
        emis_out.append(np.asarray(e))
        small_out.append(np.asarray(s))
    return np.concatenate(emis_out), np.concatenate(small_out)


def light_hit_weights(scene: Scene, obs: np.ndarray, actions: np.ndarray,
                      *, bonus: float = 9.0,
                      small_radius_below: float = 0.5) -> np.ndarray:
    """Imitation weights: 1, plus ``bonus`` where the teacher's action,
    shot from the obs's surface point, hits an emissive sphere (double
    bonus for the small lights).  Plain MSE optimises average action error,
    but the deployment metric is *light hits* — the lanes where the teacher
    is pointing at a light are exactly the ones the student must copy to
    sub-0.01 action error (a 0.1-radius light subtends ~0.017 rad)."""
    emis, small = _action_outcomes(scene, obs, actions,
                                   small_radius_below=small_radius_below)
    return (1.0 + bonus * emis + bonus * small).astype(np.float32)


def best_of_teachers_targets(scene: Scene, obs: np.ndarray, teacher_fns,
                             *, bonus: float = 9.0,
                             small_radius_below: float = 0.5):
    """Per-obs imitation target selected among several FB teachers by
    measured outcome: each teacher's action is shot from the obs's surface
    point and scored small-light hit (2) > any-light hit (1) > miss (0);
    the student imitates the best-scoring teacher (ties → the FIRST
    teacher, so list the primary/deployment teacher first).

    **Measured caveat (chandelier v4+v2 teachers, TPU, 200×100@8spp):**
    one-step outcome selection RAISES the student's one-step aimed-hit
    rate (2.8e-3 vs 1.7e-3 for the better single teacher) yet COLLAPSES
    the rendered small-light improvement (0.21-0.53× vs 1.69× for the
    single-teacher student).  The minority teacher's winning actions are
    isolated, high-weight off-manifold labels for a smooth student —
    tripled fit loss, degraded behaviour everywhere.  The fix that does
    work is :func:`hindsight_aim_targets` (sharpen the PRIMARY teacher's
    own hits; measured 1.69× → 2.06× at the same config).  This selector
    stays available for experiments; prefer single-teacher + sharpening
    for deployment models.

    Returns ``(targets, weights)`` with light_hit_weights-compatible
    weights computed on the selected action."""
    assert len(teacher_fns) >= 1
    acts, scores = [], []
    for fn in teacher_fns:
        a = np.clip(_chunked(fn, obs), -1.0, 1.0)
        emis, small = _action_outcomes(scene, obs, a,
                                       small_radius_below=small_radius_below)
        acts.append(a)
        scores.append(emis.astype(np.int32) + small.astype(np.int32))
    scores = np.stack(scores)                       # [T, N]
    best = np.argmax(scores, axis=0)                # first teacher wins ties
    targets = np.stack(acts)[best, np.arange(obs.shape[0])]
    sel = scores[best, np.arange(obs.shape[0])]
    weights = (1.0 + bonus * (sel >= 1) + bonus * (sel >= 2)
               ).astype(np.float32)
    hit_any = (scores >= 1).mean(axis=1)
    hit_small = (scores >= 2).mean(axis=1)
    print("best_of_teachers: per-teacher hit rates "
          f"any={np.round(hit_any, 4).tolist()} "
          f"small={np.round(hit_small, 4).tolist()} | selected "
          f"any={float((sel >= 1).mean()):.4f} "
          f"small={float((sel >= 2).mean()):.4f} | win share "
          f"{[float((best == t).mean()) for t in range(len(teacher_fns))]}",
          flush=True)
    return targets.astype(np.float32), weights


def hindsight_aim_targets(scene: Scene, obs: np.ndarray, actions: np.ndarray,
                          *, small_radius_below: float = 0.5,
                          bonus: float = 9.0):
    """Hindsight aim-sharpening: where the teacher's action already lands
    on an emissive sphere, replace the imitation target with the EXACT
    aim at that same sphere's centre; keep the raw teacher action
    elsewhere.  Standard hindsight relabelling of the teacher's own
    successes — the skill (which light is worth aiming at, from where)
    still comes from the FB teacher; only the aim is tightened to the
    centre of the light it chose.

    Why it works where cross-teacher selection fails: the sharpened
    targets live ON the teacher's action manifold (within the light's
    ~0.017 rad subtense of the raw action), so the target field stays
    smooth and the student fits it well — measured chandelier v4 student
    1.69× → 2.06× small-light improvement at the reference 200×100@8spp
    config, paired-data control +50% (1.37× → 2.06×).

    Returns ``(targets, weights)`` ready for :func:`distill`'s
    ``target_fn``."""
    from ..core.intersect import NO_SUPPRESS, nearest_hit, take_small
    from ..trace import sampling

    def sharpen(o, a):
        point, normal = o[:, 0:3], o[:, 6:9]
        d = sampling.fb_action_to_direction(jnp.clip(a, -1.0, 1.0), normal,
                                            "renderer")
        hit = nearest_hit(point + normal * 0.001, d, scene,
                          jnp.full(o.shape[:1], NO_SUPPRESS, jnp.int32),
                          by_abs=True)
        emis = hit.found & (take_small(scene.emitive, hit.idx) > 0)
        small = emis & (take_small(scene.radius, hit.idx)
                        < small_radius_below)
        centre = scene.centre[hit.idx]
        aim = centre - point
        aim = aim / jnp.linalg.norm(aim, axis=-1, keepdims=True)
        a_sharp = sampling.direction_to_action(aim, normal,
                                               convention="renderer")
        return jnp.where(emis[:, None], a_sharp, a), emis, small

    sharpen_j = jax.jit(sharpen)
    chunk = 1 << 19
    targets = np.empty_like(actions)
    w = np.empty(obs.shape[0], np.float32)
    for i in range(0, obs.shape[0], chunk):
        t, emis, small = sharpen_j(jnp.asarray(obs[i:i + chunk]),
                                   jnp.asarray(actions[i:i + chunk]))
        targets[i:i + chunk] = np.asarray(t)
        w[i:i + chunk] = np.asarray(1.0 + bonus * emis + bonus * small)
    return np.clip(targets, -1.0, 1.0), w


def distill(teacher_guide_fn, obs: np.ndarray, *, seed: int = 0,
            hidden: Tuple[int, ...] = (64, 64), epochs: int = 30,
            batch_size: int = 65536, learning_rate: float = 3e-3,
            jitter: float = 0.02,
            weights: Optional[np.ndarray] = None,
            weight_fn=None, target_fn=None,
            targets: Optional[np.ndarray] = None) -> DistillResult:
    """Fit the student to the teacher's actions on ``obs`` (+ jittered
    copies so the student generalises off the exact visited manifold).

    Precision matters more than usual for imitation here: actions map to
    bounce angles and the chandelier's 0.1-radius lights subtend ~0.017 rad
    from typical surfaces, so ~0.02 RMS action error already halves the
    small-light hit rate.  Cosine-decayed Adam drives the terminal loss
    low enough (~1e-5 MSE ≈ 0.003 RMS) that the student's hit behaviour
    matches the teacher's.
    """
    rng = np.random.default_rng(seed)
    obs = np.asarray(obs, np.float32)
    if jitter > 0:
        obs = np.concatenate(
            [obs, obs + rng.normal(scale=jitter,
                                   size=obs.shape).astype(np.float32)])
    # Teacher targets in bounded chunks — one batched forward over millions
    # of obs would blow HBM on the activations.  ``target_fn`` (obs →
    # (targets, weights)) overrides the single-teacher path — used by
    # distill_ensemble's outcome-selected targets, and applied AFTER
    # jittering so jittered copies get their own selection.  ``targets``
    # supplies PRECOMPUTED per-obs labels (episode-pool distillation,
    # where targets come from per-scene teacher prototypes and cannot be
    # recomputed from obs alone) — jittered copies inherit their
    # original's label/weight.
    if targets is not None:
        target = np.asarray(targets, np.float32)
        if weights is not None:
            weights = np.asarray(weights, np.float32)
        if jitter > 0:
            target = np.concatenate([target, target])
            if weights is not None:
                weights = np.concatenate([weights, weights])
    elif target_fn is not None:
        target, weights = target_fn(obs)
    else:
        target = np.clip(_chunked(teacher_guide_fn, obs), -1.0, 1.0)
        if weights is None and weight_fn is not None:
            weights = weight_fn(obs, target)
    weights = (np.ones(obs.shape[0], np.float32) if weights is None
               else np.asarray(weights, np.float32))

    obs_j = jnp.asarray(obs)
    target_j = jnp.asarray(target)
    weights_j = jnp.asarray(weights)

    student = StudentPolicy(hidden=hidden)
    params = student.init(jax.random.key(seed),
                          jnp.zeros((1, obs.shape[1])))["params"]
    steps_per_epoch = max(1, obs.shape[0] // batch_size)
    tx = optax.adam(optax.cosine_decay_schedule(
        learning_rate, epochs * steps_per_epoch, alpha=1e-3))
    opt_state = tx.init(params)

    n = obs.shape[0]
    loss = jnp.inf
    for ep in range(epochs):
        perm = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size) or [0]:
            idx = perm[i:i + batch_size]
            params, opt_state, loss = _distill_step(
                params, opt_state, obs_j[idx], target_j[idx], weights_j[idx],
                apply_fn=student.apply, tx=tx)
    return DistillResult(params=params, hidden=tuple(hidden),
                         final_loss=float(loss), n_obs=n)


class _TrajectoryStudentApply:
    """Hashable ``(params, obs, proto) -> action-mean`` adapter putting a
    distilled student behind the trajectory generator's agent-shaped guide
    interface (the proto is ignored — students bake the light conditioning
    in at distillation time).  Hash/eq on the architecture only, so jitted
    callers cache one compile per student width."""

    def __init__(self, hidden: Tuple[int, ...]):
        self.hidden = tuple(hidden)
        self._student = StudentPolicy(hidden=self.hidden)

    def __hash__(self):
        return hash(self.hidden)

    def __eq__(self, other):
        return (isinstance(other, _TrajectoryStudentApply)
                and other.hidden == self.hidden)

    def __call__(self, params, obs, proto):
        return self._student.apply({"params": params}, obs)


class DistilledGuide:
    """Deployment guide: ``obs[R,22] → action[R,2]`` through the student."""

    def __init__(self, params, hidden: Tuple[int, ...] = (64, 64)):
        self.hidden = tuple(hidden)
        self.params = params
        self._student = StudentPolicy(hidden=self.hidden)

    def as_guide_fn(self, dtype="auto"):
        """``dtype="auto"`` → bfloat16 on every backend.  Besides being the
        TPU-native precision, quantising the *observations* to bf16 turns
        out to matter behaviourally: it perturbs the aim direction by
        ~0.4% per ray in a spatially-decorrelated way, which breaks up the
        correlated hit/miss pattern a fully deterministic policy produces
        across a pixel's spp samples — measured 800 → 1104 small-light
        hits on the chandelier config, CPU, same weights.  Pass
        ``dtype=None`` for exact-f32 inference (round-trip tests)."""
        if dtype == "auto":
            dtype = jnp.bfloat16
        apply_fn = self._student.apply

        @jax.jit
        def _forward(params, obs):
            if dtype is not None:
                params = jax.tree_util.tree_map(lambda x: x.astype(dtype),
                                                params)
                obs = obs.astype(dtype)
            return apply_fn({"params": params}, obs).astype(jnp.float32)

        params = self.params

        def guide(obs):
            return _forward(params, obs)

        guide._no_rejit = True
        # The stepwise path tracer fuses this tiny MLP into its level
        # kernel (trace/path.py _level_kernel_guided): params ride as jit
        # arguments, the guide stops being a separate dispatch per level.
        guide._fused_spec = (params, dtype)
        return guide

    def as_trajectory_guide(self):
        """``(guide_apply, guide_params)`` for
        fb/trajectory.generate_trajectories — evaluates the student as the
        walk policy (episode-level held-out evals of per-type students;
        scripts/ship_models.py eval-multi)."""
        return _TrajectoryStudentApply(self.hidden), self.params

    # -- persistence (same flat-npz convention as utils/checkpoint) -------
    def save(self, path: str, obs_dim: int = 22) -> None:
        from ..utils.checkpoint import _flatten
        np.savez(path, __hidden__=np.asarray(self.hidden, np.int64),
                 __obs_dim__=np.asarray(obs_dim, np.int64),
                 **_flatten(self.params))

    @staticmethod
    def load(path: str) -> "DistilledGuide":
        from ..utils.checkpoint import _unflatten_like
        z = np.load(path)
        hidden = tuple(int(h) for h in z["__hidden__"])
        obs_dim = int(z["__obs_dim__"])
        template = StudentPolicy(hidden=hidden).init(
            jax.random.key(0), jnp.zeros((1, obs_dim)))["params"]
        flat = {k: z[k] for k in z.files
                if not k.startswith("__")}
        return DistilledGuide(_unflatten_like(template, flat), hidden)


def distill_agent(agent, scene: Scene, *, seed: int = 0,
                  camera_position=(0.0, 2.0, 0.0),
                  frames: int = 4, epochs: int = 30,
                  hidden: Tuple[int, ...] = (64, 64),
                  extra_obs: Optional[np.ndarray] = None,
                  hit_weight_bonus: float = 9.0,
                  hindsight_sharpen: bool = False
                  ) -> Tuple[DistilledGuide, DistillResult]:
    """One-call distillation of a ``TrainedFBAgent`` on its scene, with
    light-hit-weighted imitation (see ``light_hit_weights``).

    Observations are collected at both deployment aspect ratios (2:1 —
    the reference's 200×100 comparisons — and 4:3 — the 800×600 render
    configs); see the aspect/coverage note on ``collect_observations``.

    ``hindsight_sharpen=True`` relabels the teacher's hitting actions
    with exact centre aim (:func:`hindsight_aim_targets`) — measured
    +22% rendered small-light improvement at the reference config on the
    shipped chandelier v4 teacher."""
    teacher = agent.as_guide_fn(dtype=None)          # f32 teacher targets
    k1, k2 = jax.random.split(jax.random.key(seed))
    obs_wide = collect_observations(scene, teacher, k1, frames=frames,
                                    width=128, height=64,
                                    camera_position=camera_position)
    obs_tall = collect_observations(scene, teacher, k2, frames=frames,
                                    width=96, height=72,
                                    camera_position=camera_position)
    obs = np.concatenate([obs_wide, obs_tall])
    if extra_obs is not None and len(extra_obs):
        obs = np.concatenate([obs, np.asarray(extra_obs, np.float32)])
    target_fn = None
    weight_fn = None
    if hindsight_sharpen:
        def target_fn(o):
            acts = np.clip(_chunked(teacher, o), -1.0, 1.0)
            return hindsight_aim_targets(scene, o, acts,
                                         bonus=hit_weight_bonus)
    elif hit_weight_bonus > 0:
        def weight_fn(o, a):
            return light_hit_weights(scene, o, a, bonus=hit_weight_bonus)
    res = distill(teacher, obs, seed=seed, hidden=hidden, epochs=epochs,
                  weight_fn=weight_fn, target_fn=target_fn)
    return DistilledGuide(res.params, res.hidden), res


def distill_ensemble(agents, scene: Scene, *, seed: int = 0,
                     camera_position=(0.0, 2.0, 0.0), frames: int = 4,
                     epochs: int = 30, hidden: Tuple[int, ...] = (128, 128),
                     hit_weight_bonus: float = 9.0
                     ) -> Tuple[DistilledGuide, DistillResult]:
    """Distil SEVERAL trained FB agents into one student with per-obs
    outcome-selected targets (``best_of_teachers_targets``).

    Observations are collected under EVERY teacher's own guided renders at
    both deployment aspects, so the pooled obs distribution covers each
    teacher's on-policy manifold; targets then pick, per obs, the teacher
    whose action measurably lands on a (small) light.  List the primary
    deployment teacher first — it wins ties and supplies the target where
    no teacher hits."""
    teachers = [a.as_guide_fn(dtype=None) for a in agents]
    key = jax.random.key(seed)
    pools = []
    for t in teachers:
        key, k1, k2 = jax.random.split(key, 3)
        pools.append(collect_observations(
            scene, t, k1, frames=frames, width=128, height=64,
            camera_position=camera_position))
        pools.append(collect_observations(
            scene, t, k2, frames=frames, width=96, height=72,
            camera_position=camera_position))
    obs = np.concatenate(pools)

    def target_fn(o):
        return best_of_teachers_targets(scene, o, teachers,
                                        bonus=hit_weight_bonus)

    res = distill(None, obs, seed=seed, hidden=hidden, epochs=epochs,
                  target_fn=target_fn)
    return DistilledGuide(res.params, res.hidden), res
