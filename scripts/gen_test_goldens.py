"""Regenerate every fixture in tests/golden/ by *executing* the reference
implementation at /root/reference (VERDICT r3 item 8: the generators belong
in the working tree so the fixtures are reproducible; the full-res parity
goldens already have scripts/gen_parity_fullres.py — this covers the rest).

Parts (each runs the reference's own classes; nothing is copied):

  true_original  tests/golden/true_original_61.npy
                 61x61 grid (RAY_COUNT=30, RAY_STEP=1/30) of the
                 RL/output5.py:416-533 render_true_original scene traced
                 with the reference's Ray.nearestSphereIntersect +
                 terminalRGB (f64), pixel = min(1, c/255).
  chandelier     tests/golden/chandelier_traditional_40x20_nojitter.npy
                 40x20 pixel-centre frame from the reference chandelier
                 TraditionalRenderer.trace_ray_traditional (max_bounces=3,
                 spp=1 — deterministic: every non-emissive chandelier
                 sphere mirrors under the `reflective > 0` rule :481).
  output5        tests/golden/output5_traditional_25_mb1.npy
                 25x25 grid through CustomSceneExperiment
                 ._trace_custom_traditional at max_bounces=1 (the only
                 bounce-direction-free config — exact fixture).
  env_rl         tests/golden/env_trajectory_rl.json
                 Scripted trajectory through RL/ray_tracer_env.py with the
                 RL/train_raytracer.py create_scene() scene.
  env_fb         tests/golden/env_trajectory_fb.json
                 Scripted step through FB/ray_tracer_env.py with the
                 output5 custom scene (sun id 7).

Run parts individually (the two env parts import colliding module names
from RL/ and FB/, so `all` dispatches each part to a subprocess):

    python scripts/gen_test_goldens.py all --check

With --check, each part asserts the regenerated fixture matches the
committed one instead of overwriting it.
"""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parents[1] / "tests" / "golden"


def _finish(name: str, new, check: bool):
    path = GOLDEN / name
    if check:
        if name.endswith(".npy"):
            old = np.load(path)
            np.testing.assert_array_equal(np.asarray(new), old)
        else:
            old = json.loads(path.read_text())
            assert json.loads(json.dumps(new)) == old, f"{name} differs"
        print(f"{name}: regenerated output MATCHES the committed fixture")
    else:
        if name.endswith(".npy"):
            np.save(path, new)
        else:
            path.write_text(json.dumps(new))
        print(f"wrote {path}")


def gen_true_original(check: bool):
    sys.path.insert(0, "/root/reference/RL")
    import matplotlib
    matplotlib.use("Agg")
    import output5
    from colour import Colour
    from light import GlobalLight, PointLight
    from material import Material
    from object import Sphere
    from ray import Ray
    from vector import Vector

    spheres = output5.create_custom_scene()["custom_scene"]
    # render_true_original's own light/sun construction (output5.py:446-483)
    # at the 61x61 test grid instead of 601x601.
    RAY_COUNT, RAY_STEP = 30, 1.0 / 30.0
    X = [r * RAY_STEP for r in range(-RAY_COUNT, 0)] + \
        [r * RAY_STEP for r in range(0, RAY_COUNT + 1)]
    Y = [r * RAY_STEP for r in range(RAY_COUNT, 0, -1)] + \
        [-r * RAY_STEP for r in range(0, RAY_COUNT + 1)]
    glights = [GlobalLight(vector=Vector(3, 1, -0.75),
                           colour=Colour(20, 20, 255), strength=1,
                           max_angle=np.radians(90), func=0)]
    sun = Sphere(id=0, centre=Vector(-0.6, 0.2, 6), radius=0.1,
                 material=Material(emitive=True), colour=Colour(255, 255, 204))
    plights = [PointLight(id=sun.id, position=sun.centre, colour=sun.colour,
                          strength=1, max_angle=np.radians(90), func=-1)]
    all_spheres = [s for s in spheres if not (hasattr(s, "id") and s.id == 7)]
    all_spheres.append(sun)
    bg = Colour(2, 2, 5)
    cam = Vector(0, 0, 1)
    img = np.zeros((len(Y), len(X), 3), np.float64)
    for yi, y in enumerate(Y):
        for xi, x in enumerate(X):
            ray = Ray(origin=cam, D=Vector(x=x, y=y, z=-1))
            term = ray.nearestSphereIntersect(all_spheres, max_bounces=5)
            c = bg if term is None else term.terminalRGB(
                spheres=all_spheres, background_colour=bg,
                global_light_sources=glights, point_light_sources=plights)
            img[yi, xi] = [min(1.0, c.r / 255.0), min(1.0, c.g / 255.0),
                           min(1.0, c.b / 255.0)]
    _finish("true_original_61.npy", img, check)


def gen_chandelier(check: bool):
    sys.path.insert(0, "/root/reference/FB")
    import fb_vs_traditional_chandelier as ch

    spheres = ch.generate_chandelier_scene()
    lights = [s for s in spheres if s.material.emitive]
    r = ch.TraditionalRenderer()
    r.scene = spheres
    r.light_sources = lights
    r.small_lights = [s for s in lights if s.radius < 0.5]
    r.camera_position = ch.Vector(0, 2, 0)
    W, H = 40, 20
    r.set_render_settings(W, H, max_bounces=3, samples_per_pixel=1)
    img = np.zeros((H, W, 3), np.float64)
    for y in range(H):
        for x in range(W):
            c = r.trace_ray_traditional(r.generate_camera_ray(x, y), 0)
            img[y, x] = (c.r, c.g, c.b)
    _finish("chandelier_traditional_40x20_nojitter.npy", img, check)


def gen_output5(check: bool):
    sys.path.insert(0, "/root/reference/RL")
    import matplotlib
    matplotlib.use("Agg")
    import output5

    exp = output5.CustomSceneExperiment(output_dir="/tmp/_gen_output5")
    exp.config["max_bounces"] = 1
    spheres = output5.create_custom_scene()["custom_scene"]
    RAY_COUNT, RAY_STEP = 12, 1.0 / 12.0
    X = [r * RAY_STEP for r in range(-RAY_COUNT, 0)] + \
        [r * RAY_STEP for r in range(0, RAY_COUNT + 1)]
    Y = [r * RAY_STEP for r in range(RAY_COUNT, 0, -1)] + \
        [-r * RAY_STEP for r in range(0, RAY_COUNT + 1)]
    cam = output5.Vector(0, 0, 1)
    img = np.zeros((len(Y), len(X), 3), np.float64)
    for yi, y in enumerate(Y):
        for xi, x in enumerate(X):
            ray = output5.Ray(origin=cam, D=output5.Vector(x=x, y=y, z=-1))
            stats = {"reward": 0, "light_hits": 0, "steps": 0}
            c, _, _ = exp._trace_enhanced_traditional(
                ray, spheres, "custom_scene", stats, ["traditional_mimic"])
            img[yi, xi] = (c.r, c.g, c.b)
    _finish("output5_traditional_25_mb1.npy", img, check)


def _walk_env(env, pixel, actions):
    obs, _ = env.reset(options={"pixel": tuple(pixel)})
    rec = {"obs": [np.asarray(obs, np.float64).tolist()], "rewards": [],
           "terminated": []}
    for a in actions:
        obs, r, term, trunc, _ = env.step(np.asarray(a, np.float32))
        rec["obs"].append(np.asarray(obs, np.float64).tolist())
        rec["rewards"].append(float(r))
        rec["terminated"].append(bool(term))
        if term or trunc:
            break
    return rec


def gen_env_rl(check: bool):
    sys.path.insert(0, "/root/reference/RL")
    # train_raytracer imports SB3 at module top; only create_scene is
    # needed here — stub the import when SB3 is absent from the image.
    import types

    class _AnyModule(types.ModuleType):
        __path__: list = []

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return object

    for mod in ("stable_baselines3", "stable_baselines3.common",
                "stable_baselines3.common.env_checker",
                "stable_baselines3.common.env_util",
                "stable_baselines3.common.evaluation",
                "stable_baselines3.common.callbacks"):
        sys.modules.setdefault(mod, _AnyModule(mod))
    import train_raytracer as tr
    from ray_tracer_env import RayTracerEnv
    from vector import Vector
    from colour import Colour

    spheres, gl, pl = tr.create_scene()
    fix = {"width": 100, "height": 100, "fov": 90, "max_bounces": 5,
           "pixel": [50, 58],
           "actions": [[0.2, 1.0], [0.5, 3.0], [0.1, 0.5], [0.7, 4.5],
                       [0.3, 2.0]]}
    env = RayTracerEnv(spheres=spheres, image_width=fix["width"],
                       image_height=fix["height"],
                       camera_position=Vector(0, 0, 0), fov=fix["fov"],
                       max_bounces=fix["max_bounces"],
                       background_colour=Colour(0, 0, 0),
                       global_light_sources=gl, point_light_sources=pl)
    fix.update(_walk_env(env, fix["pixel"], fix["actions"]))
    _finish("env_trajectory_rl.json", fix, check)


def gen_env_fb(check: bool):
    sys.path.insert(0, "/root/reference/FB")
    sys.path.insert(1, "/root/reference/RL")
    import matplotlib
    matplotlib.use("Agg")
    import output5                       # RL/: the custom scene factory
    from ray_tracer_env import RayTracerEnv   # FB/ variant (path order)
    from vector import Vector
    from colour import Colour

    spheres = output5.create_custom_scene()["custom_scene"]
    fix = {"width": 100, "height": 100, "fov": 60, "max_bounces": 8,
           "pixel": [50, 40], "actions": [[-1.0, 0.0]]}
    env = RayTracerEnv(spheres=spheres, image_width=fix["width"],
                       image_height=fix["height"],
                       camera_position=Vector(0, 0, 1), fov=fix["fov"],
                       max_bounces=fix["max_bounces"],
                       background_colour=Colour(2, 2, 5))
    fix.update(_walk_env(env, fix["pixel"], fix["actions"]))
    _finish("env_trajectory_fb.json", fix, check)


PARTS = {"true_original": gen_true_original, "chandelier": gen_chandelier,
         "output5": gen_output5, "env_rl": gen_env_rl, "env_fb": gen_env_fb}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    check = "--check" in sys.argv
    part = args[0] if args else "all"
    if part == "all":
        for name in PARTS:
            cmd = [sys.executable, __file__, name] + \
                  (["--check"] if check else [])
            subprocess.run(cmd, check=True)
    else:
        PARTS[part](check)
