"""The interactive viewer server (``io.viewer`` — the live ``vdb_view``
equivalent): endpoint contract over real ``.vdb`` frames."""

import gzip
import io
import json
import os
import urllib.request

import numpy as np
import pytest

from fluidsim_tpu.io import vdb
from fluidsim_tpu.io.viewer import serve, _frame_points


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        vals = rng.random((12, 12, 12)).astype(np.float32)
        act = vals > 0.5
        vals[~act] = 0.0
        p = str(d / f"f{i}.vdb")
        vdb.write_vdb(p, [vdb.VdbGrid(values=vals, origin=(-6, -6, -6),
                                      active=act, name="density")])
        paths.append(p)
    return paths


def test_frame_points_shape(frames):
    pts = _frame_points(frames[0])
    assert pts.dtype == np.float32 and pts.shape[1] == 4
    assert pts.shape[0] > 0
    assert np.abs(pts[:, :3]).max() <= 6
    assert 0.0 <= pts[:, 3].min() and pts[:, 3].max() <= 1.0


def test_server_endpoints(frames):
    srv = serve(frames, port=0, block=False)      # port 0: ephemeral
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        html = urllib.request.urlopen(f"{base}/").read().decode()
        assert "webgl" in html and "clip" in html

        info = json.loads(urllib.request.urlopen(f"{base}/info").read())
        assert info["frames"] == [0, 1]
        assert info["bound"] >= 6

        req = urllib.request.Request(f"{base}/frame/1")
        resp = urllib.request.urlopen(req)
        raw = resp.read()
        if resp.headers.get("Content-Encoding") == "gzip":
            raw = gzip.decompress(raw)
        pts = np.frombuffer(raw, np.float32).reshape(-1, 4)
        expect = _frame_points(frames[1])
        np.testing.assert_array_equal(pts, expect)

        assert urllib.request.urlopen(f"{base}/frame/9",
                                      timeout=5).status == 404
    except urllib.error.HTTPError as e:
        assert e.code == 404                       # the /frame/9 probe
    finally:
        srv.shutdown()
        srv.server_close()
