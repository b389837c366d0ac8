import jax.numpy as jnp
import numpy as np

from unitex_tpu.camera import generate_intrinsics, generate_box_views_c2ws
from unitex_tpu.geometry.mesh import Mesh
from unitex_tpu.geometry.primitives import make_cube, make_icosphere
from unitex_tpu.render.scene import SceneObject, flatten_scene, render_scene


def _translate(t):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = t
    return jnp.asarray(m)


def _objects():
    s = make_icosphere(2)
    c = make_cube()
    sphere = SceneObject(
        Mesh(jnp.asarray(s.vertices * 0.4), jnp.asarray(s.faces)),
        transform=_translate([-0.5, 0, 0]),
        base_color=(1.0, 0.0, 0.0),
    )
    cube = SceneObject(
        Mesh(
            jnp.asarray(c.vertices * 0.6), jnp.asarray(c.faces),
            uv=jnp.asarray(c.uv), faces_uv=jnp.asarray(c.faces_uv),
        ),
        transform=_translate([0.5, 0, 0]),
        texture=jnp.ones((8, 8, 3)) * jnp.asarray([0.0, 0.0, 1.0]),
    )
    return [sphere, cube]


def test_flatten_scene_ids():
    merged, fids = flatten_scene(_objects())
    assert merged.faces.shape[0] == fids.shape[0]
    assert set(np.unique(np.asarray(fids))) == {0, 1}
    # transforms applied: sphere centroid near x=-0.5
    s_mask = np.asarray(fids) == 0
    s_faces = np.asarray(merged.faces)[s_mask]
    centroid = np.asarray(merged.vertices)[np.unique(s_faces)].mean(0)
    np.testing.assert_allclose(centroid[0], -0.5, atol=0.05)


def test_render_scene_colors_and_ids():
    c2ws = generate_box_views_c2ws(2.8)[:1]
    intr = generate_intrinsics(1.0, 1.0, fov=False)
    out = render_scene(
        _objects(), c2ws, intr, (64, 64), perspective=False
    )
    oid = np.asarray(out["object_id"])[0]
    rgb = np.asarray(out["rgb"])[0]
    # both objects visible, on opposite image halves (front view: world x -> image x)
    assert (oid == 0).any() and (oid == 1).any()
    # sphere (red) pixels
    red = rgb[oid == 0]
    assert red[:, 0].mean() > 0.8 and red[:, 2].mean() < 0.2
    blue = rgb[oid == 1]
    assert blue[:, 2].mean() > 0.8 and blue[:, 0].mean() < 0.2
    # background white
    assert rgb[oid == -1].mean() > 0.95
