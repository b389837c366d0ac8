"""Interactive viewer (render/viewer.py) — server round trip on a tiny
mesh, driven through the real HTTP surface."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from unitex_tpu.geometry.io.mesh_io import HostMesh, save_obj
from unitex_tpu.render import viewer as vw


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    # a unit tetrahedron, no texture
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    v = v - v.mean(axis=0, keepdims=True)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    path = str(tmp_path_factory.mktemp("mesh") / "tet.obj")
    save_obj(path, HostMesh(vertices=v, faces=f))
    httpd = vw.serve(path, port=0, poll=0.1)  # port 0: ephemeral
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


class TestViewer:
    def test_index_page(self, served):
        status, ctype, body = _get(served + "/")
        assert status == 200 and "text/html" in ctype
        assert b"unitex_tpu" in body

    def test_info(self, served):
        status, _, body = _get(served + "/info")
        info = json.loads(body)
        assert info == {"n_vertices": 4, "n_faces": 4, "textured": False}

    def test_render_modes(self, served):
        from unitex_tpu.utils.image_io import imfrombytes
        for mode in ("rgb", "normal", "ccm", "alpha"):
            status, ctype, body = _get(
                served + f"/render?az=30&el=20&dist=2.5&mode={mode}&size=64")
            assert status == 200 and ctype == "image/png", mode
            img = imfrombytes(body)
            assert img.shape == (64, 64, 3)
            assert img.min() < 0.999  # the mesh is visible

    def test_render_moves_with_camera(self, served):
        from unitex_tpu.utils.image_io import imfrombytes
        _, _, a = _get(served + "/render?az=0&el=0&dist=2.5&mode=normal&size=64")
        _, _, b = _get(served + "/render?az=120&el=0&dist=2.5&mode=normal&size=64")
        assert not np.allclose(imfrombytes(a), imfrombytes(b))

    def test_bad_mode_400(self, served):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(served + "/render?mode=bogus")
        assert ei.value.code == 400

    def test_404(self, served):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(served + "/nope")
        assert ei.value.code == 404
