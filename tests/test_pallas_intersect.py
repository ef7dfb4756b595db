"""Pallas nearest-hit kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.core.intersect import NO_SUPPRESS, nearest_hit
from raytracer_tpu.scene import library

pallas_mod = pytest.importorskip("raytracer_tpu.core.pallas_intersect")
from jax.experimental.pallas import tpu as pltpu


@pytest.mark.parametrize("by_abs", [False, True])
def test_pallas_matches_xla(by_abs, rng):
    scene, _, _, _ = library.chandelier_scene()
    R = 4096
    o = jnp.asarray(rng.uniform(-3, 3, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    sup = jnp.where(jnp.arange(R) % 3 == 0, scene.id[0],
                    NO_SUPPRESS).astype(jnp.int32)

    ref = nearest_hit(o, d, scene, sup, by_abs=by_abs)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_mod.nearest_hit_pallas(o, d, scene, sup, by_abs=by_abs)

    np.testing.assert_array_equal(np.asarray(out.found), np.asarray(ref.found))
    f = np.asarray(ref.found)
    np.testing.assert_array_equal(np.asarray(out.idx)[f],
                                  np.asarray(ref.idx)[f])
    np.testing.assert_allclose(np.asarray(out.t)[f], np.asarray(ref.t)[f],
                               rtol=2e-4, atol=2e-4)


def test_pallas_non_multiple_tile(rng):
    scene, _, _, _ = library.chandelier_scene()
    R = 1000    # not a multiple of TILE
    o = jnp.asarray(rng.uniform(-3, 3, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    sup = jnp.full((R,), NO_SUPPRESS, jnp.int32)
    ref = nearest_hit(o, d, scene, sup)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_mod.nearest_hit_pallas(o, d, scene, sup)
    np.testing.assert_array_equal(np.asarray(out.found), np.asarray(ref.found))
