"""Native C++ host library vs the numpy reference implementations."""

import numpy as np
import pytest

from kinpoly_tpu.anim import stl
from kinpoly_tpu.utils import native

STL_PATH = "/root/reference/assets/mujoco_models/geom/Head.stl"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_parse_stl_matches_numpy(lib):
    with open(STL_PATH, "rb") as f:
        data = f.read()
    fast = native.parse_stl(data)
    assert fast is not None
    v_fast, f_fast = fast

    # numpy reference path (bypass the native fast path)
    import struct

    (ntri,) = struct.unpack_from("<I", data, 80)
    rec = np.frombuffer(data, dtype=np.uint8, count=ntri * 50, offset=84).reshape(ntri, 50)
    tri = rec[:, 12:48].copy().view("<f4").reshape(ntri, 3, 3).astype(np.float64)

    # triangles reconstructed from (verts, faces) must match the raw soup
    np.testing.assert_allclose(v_fast[f_fast], tri, atol=0)
    assert v_fast.shape[0] <= ntri * 3


def test_mass_properties_match(lib):
    verts, faces = stl.read_stl(STL_PATH)
    ref = stl.mesh_mass_properties(verts, faces)
    fast = native.mesh_mass_properties(verts, faces)
    assert fast is not None
    mass, com, inertia = fast
    np.testing.assert_allclose(mass, ref.mass, rtol=1e-12)
    np.testing.assert_allclose(com, ref.com, rtol=1e-10)
    np.testing.assert_allclose(inertia, ref.inertia, rtol=1e-9)


def test_gather_windows_matches_numpy(lib):
    rng = np.random.RandomState(0)
    clip = rng.randn(50, 7).astype(np.float32)
    starts = np.asarray([0, 10, 45], np.int32)
    out = native.gather_windows(clip, starts, 12)
    idx = np.minimum(starts[:, None] + np.arange(12)[None], 49)
    np.testing.assert_array_equal(out, clip[idx])
