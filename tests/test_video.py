import os

import jax.numpy as jnp
import numpy as np

from unitex_tpu.geometry.io.mesh_io import save_mesh
from unitex_tpu.geometry.mesh import Mesh
from unitex_tpu.geometry.primitives import make_icosphere
from unitex_tpu.geometry.uv_atlas import unwrap_atlas
from unitex_tpu.render.video import export_orbit_video, render_orbit_frames


def _mesh():
    s = make_icosphere(2)
    return Mesh(jnp.asarray(s.vertices * 0.9), jnp.asarray(s.faces))


def test_orbit_frames_types():
    mesh = _mesh()
    for vt in ("normal", "ccm"):
        frames = render_orbit_frames(
            mesh, None, n_frames=4, size=32, batch=2, video_type=vt
        )
        assert frames.shape == (4, 32, 32, 3)
        assert frames.dtype == np.uint8
        # sphere visible in every frame: non-background pixels exist
        assert (frames < 250).any(axis=(1, 2, 3)).all()


def test_orbit_frames_rotate():
    mesh = _mesh()
    frames = render_orbit_frames(
        mesh, None, n_frames=8, size=32, batch=4, video_type="normal"
    )
    # consecutive frames differ (the orbit actually turns)
    diffs = [np.abs(frames[i].astype(int) - frames[i + 1].astype(int)).mean() for i in range(7)]
    assert min(diffs) > 0.1


def test_export_video_file(tmp_path):
    host = unwrap_atlas(make_icosphere(2), size=64, gutter=1)
    host.texture = np.full((64, 64, 3), 128, np.uint8)
    path = str(tmp_path / "m.glb")
    save_mesh(path, host)
    out = export_orbit_video(
        path, str(tmp_path / "orbit.mp4"), n_frames=4, size=32, fps=4,
        save_camera=True,
    )
    # mp4 when ffmpeg exists, gif fallback otherwise
    assert os.path.exists(out)
    assert out.endswith((".mp4", ".gif"))
    assert os.path.getsize(out) > 0
    cam = np.load(str(tmp_path / "orbit_camera.npz"))
    assert cam["c2ws"].shape == (4, 4, 4)


def test_export_turntable_grid(tmp_path):
    from unitex_tpu.render.video import export_turntable

    host = unwrap_atlas(make_icosphere(2), size=64, gutter=1)
    host.texture = np.full((64, 64, 3), 90, np.uint8)
    path = str(tmp_path / "m.glb")
    save_mesh(path, host)
    out = export_turntable(path, str(tmp_path / "grid.png"), n_frames=5, size=32)
    from PIL import Image

    img = Image.open(out)
    assert img.size == (96, 64)  # 3 cols x 2 rows of 32


def test_height_sweep(tmp_path):
    from unitex_tpu.render.video import (
        export_turntable,
        render_height_sweep_frames,
    )

    frames = render_height_sweep_frames(_mesh(), None, n_frames=6, size=32)
    assert frames.shape == (6, 32, 32, 3)
    # the three orbit bands look down from different heights: band frames
    # must differ from the equatorial band's
    assert np.abs(frames[0].astype(int) - frames[4].astype(int)).mean() > 0.1

    host = unwrap_atlas(make_icosphere(2), size=64, gutter=1)
    host.texture = np.full((64, 64, 3), 90, np.uint8)
    path = str(tmp_path / "m.glb")
    save_mesh(path, host)
    out = export_turntable(
        path, str(tmp_path / "sweep.gif"), n_frames=6, size=32,
        height_sweep=True,
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0
