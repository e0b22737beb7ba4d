"""Native .lavpack store: build, write, mmap-read, episode roundtrip."""

import os
import shutil
import subprocess

import numpy as np
import pytest

HAS_GXX = shutil.which("g++") is not None

pytestmark = pytest.mark.skipif(not HAS_GXX, reason="no C++ toolchain")


def test_lavpack_roundtrip(tmp_path):
    from lav_tpu.data.lavpack import LavPackStore, LavPackWriter

    p = str(tmp_path / "t.lavpack")
    w = LavPackWriter(p)
    payloads = {f"key_{i:03d}".encode(): os.urandom(64 * i + 1) for i in range(20)}
    for k, v in payloads.items():
        w.put(k, v)
    w.finish()

    s = LavPackStore(p)
    for k, v in payloads.items():
        assert s.get(k) == v
    assert s.get(b"nope") is None
    assert len(s.keys()) == 20
    s.close()


def test_lavpack_episode(tmp_path):
    from lav_tpu.data.lavpack import LavPackStore, convert_episode
    from lav_tpu.data.store import Episode, make_synthetic_episode

    ep = make_synthetic_episode(n_frames=5, n_lidar=32, img_hw=(16, 16),
                                bev_hw=(32, 32))
    p = convert_episode(ep, str(tmp_path / "ep.lavpack"))
    ep2 = Episode(LavPackStore(p))
    assert len(ep2) == 5
    np.testing.assert_array_equal(
        ep2.access("lidar", 1, 1), ep.access("lidar", 1, 1)
    )
    np.testing.assert_array_equal(
        ep2.load_img("rgb_0", 2), ep.load_img("rgb_0", 2)
    )
