"""Frame export, checkpointing, async saver, CLI end-to-end."""

import io
import os
import struct

import numpy as np
import pytest

from libclsph_tpu.io import geo_format
from libclsph_tpu.io.async_saver import AsyncSaver
from libclsph_tpu.io.bgeo import dump_bgeo
from libclsph_tpu.io.checkpoint import (
    load_checkpoint,
    params_fingerprint,
    save_checkpoint,
)
from libclsph_tpu.io.houdini import HoudiniFileSaver, zero_pad_number

from conftest import WATER, MUCUS, make_params


class TestGeoFormat:
    def test_golden_layout(self):
        """Exact .geo layout per HoudiniFileDumpHelper.cpp:19-90."""
        pos = np.array([[1.0, 2.0, 3.0], [4.0, 5.5, 6.25]], np.float32)
        vel = np.array([[0.1, 0.2, 0.3], [0.0, -1.0, 0.5]], np.float32)
        col = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.5]], np.float32)
        s = geo_format.geo_string(pos, vel, col, 0.05)
        expected = (
            "PGEOMETRY V5\n"
            "NPoints 2 NPrims 1\n"
            "NPointGroups 0 NPrimGroups 1\n"
            "NPointAttrib 3 NVertexAttrib 0 NPrimAttrib 2 NAttrib 0\n"
            "PointAttrib\n"
            "v 3 float 1 1 1\n"
            "color 3 float 1 1 1\n"
            "mass 1 float 1\n"
            "1 2 3 0 (0.1 0.2 0.3\t1 0 0\t0.05)\n"
            "4 5.5 6.25 0 (0 -1 0.5\t0 1 0.5\t0.05)\n"
            "PrimitiveAttrib\n"
            "generator 1 index 1 location1\n"
            "dopobject 1 index 1 /obj/AutoDopNetwork:1\n"
            "Part 2 0 1 [0\t0]\n"
            "box_object1 unordered\n"
            "1 1\n"
            "beginExtra\n"
            "endExtra\n"
        )
        assert s == expected

    def test_color_ramp_matches_reference(self):
        """density->RGB ramp (houdini_file_saver.cpp:46-60)."""
        d = np.array([0.0, 250.0, 750.0, 1000.0, 1250.0, 1750.0, 2500.0])
        c = geo_format.density_color_ramp(d)
        # R: only (1000, 2000]
        np.testing.assert_allclose(c[:, 0], [0, 0, 0, 0, 0.25, 0.75, 0])
        # G: [0, 1000)
        np.testing.assert_allclose(c[:, 1], [1.0, 0.75, 0.25, 0, 0, 0, 0])
        # B: [500,1000] ramp up, [1000,1500] ramp down
        np.testing.assert_allclose(c[:, 2], [0, 0, 0.5, 1.0, 0.5, 0, 0])

    def test_large_frame_roundtrip_parse(self):
        n = 5000
        rng = np.random.default_rng(0)
        pos = rng.standard_normal((n, 3)).astype(np.float32)
        vel = rng.standard_normal((n, 3)).astype(np.float32)
        col = rng.random((n, 3)).astype(np.float32)
        s = geo_format.geo_string(pos, vel, col, 0.05)
        lines = s.splitlines()
        assert lines[1] == f"NPoints {n} NPrims 1"
        # parse a middle point line back
        row = lines[8 + 123].split(" (")
        p = np.fromstring(row[0], sep=" ") if hasattr(np, "fromstring") else None
        vals = [float(x) for x in row[0].split()]
        np.testing.assert_allclose(vals[:3], pos[123], rtol=1e-4, atol=1e-5)


class TestBgeo:
    def test_header_and_size(self):
        pos = np.zeros((3, 3), np.float32)
        vel = np.ones((3, 3), np.float32)
        col = np.zeros((3, 3), np.float32)
        buf = io.BytesIO()
        dump_bgeo(buf, pos, vel, col, 0.05, 0.06)
        b = buf.getvalue()
        assert b[:5] == b"BgeoV"
        version = struct.unpack(">i", b[5:9])[0]
        assert version == 5
        npoints = struct.unpack(">i", b[9:13])[0]
        assert npoints == 3

    def test_roundtrip_independent_parser(self, rng):
        """Full round-trip through the independent partio-semantics
        reader (tests/bgeo_reader.py): every field, strict EOF."""
        from bgeo_reader import read_bgeo

        n = 257
        pos = rng.standard_normal((n, 3)).astype(np.float32)
        vel = rng.standard_normal((n, 3)).astype(np.float32)
        col = rng.random((n, 3)).astype(np.float32)
        buf = io.BytesIO()
        dump_bgeo(buf, pos, vel, col, 0.05, 0.0625)
        out = read_bgeo(buf.getvalue())

        assert out["counts"] == {"points": n, "prims": 0, "point_attribs": 5}
        np.testing.assert_array_equal(out["position"], pos)
        np.testing.assert_array_equal(out["w"], np.ones(n, np.float32))
        a = out["attributes"]
        # the reference adapter's schema (PartioFunctions.h:8-13)
        assert list(a) == ["velocity", "color", "id", "mass", "pscale"]
        np.testing.assert_array_equal(a["velocity"], vel)
        np.testing.assert_array_equal(a["color"], col)
        assert a["id"].dtype.kind == "i"
        np.testing.assert_array_equal(
            a["id"].ravel(), np.arange(n, dtype=np.int32)
        )
        np.testing.assert_allclose(a["mass"].ravel(), 0.05)
        np.testing.assert_allclose(a["pscale"].ravel(), 0.0625)

    def test_parser_rejects_corruption(self, rng):
        """The validating parser must actually catch writer bugs:
        truncation, bad magic, and trailing garbage all raise."""
        import pytest

        from bgeo_reader import BgeoError, read_bgeo

        buf = io.BytesIO()
        dump_bgeo(
            buf,
            np.zeros((4, 3), np.float32),
            np.zeros((4, 3), np.float32),
            np.zeros((4, 3), np.float32),
            0.05,
            0.06,
        )
        good = buf.getvalue()
        with pytest.raises(BgeoError):
            read_bgeo(good[:-3])  # truncated payload
        with pytest.raises(BgeoError):
            read_bgeo(b"XgeoV" + good[5:])  # bad magic
        with pytest.raises(BgeoError):
            read_bgeo(good + b"\x00")  # trailing garbage


class TestZeroPad:
    def test_reference_quirk(self):
        # pad to 9 then keep last 7 (houdini_file_saver.cpp:15-23)
        assert zero_pad_number(1) == "0000001"
        assert zero_pad_number(1234567) == "1234567"
        assert zero_pad_number(12345678) == "2345678"


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        p = make_params(WATER, n=64)
        arrays = {
            "position": np.random.rand(64, 3).astype(np.float32),
            "velocity": np.random.rand(64, 3).astype(np.float32),
        }
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, arrays, p)
        out = load_checkpoint(path, p)
        np.testing.assert_array_equal(out["position"], arrays["position"])

    def test_missing_returns_none(self, tmp_path):
        p = make_params(WATER, n=64)
        assert load_checkpoint(str(tmp_path / "nope.npz"), p) is None

    def test_stale_params_rejected(self, tmp_path):
        p1 = make_params(WATER, n=64)
        p2 = make_params(MUCUS, n=64)
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, {"position": np.zeros((64, 3), np.float32)}, p1)
        with pytest.raises(ValueError):
            load_checkpoint(path, p2)

    def test_fingerprint_differs(self):
        assert params_fingerprint(make_params(WATER, n=64)) != params_fingerprint(
            make_params(WATER, n=128)
        )


class TestAsyncSaver:
    def test_ordering_and_join(self, tmp_path):
        s = AsyncSaver()
        order = []
        for i in range(5):
            s.submit(lambda i=i: order.append(i))
        s.close()
        assert order == [0, 1, 2, 3, 4]

    def test_error_surfaces(self):
        s = AsyncSaver()

        def boom():
            raise RuntimeError("disk full")

        s.submit(boom)
        with pytest.raises(RuntimeError):
            s.close()


class TestHoudiniSaver:
    def test_writes_sequenced_frames(self, tmp_path):
        p = make_params(WATER, n=8)
        saver = HoudiniFileSaver(str(tmp_path) + "/")
        arrays = {
            "position": np.zeros((8, 3), np.float32),
            "velocity": np.zeros((8, 3), np.float32),
            "density": np.full((8,), 900.0, np.float32),
        }
        saver.write_frame_to_file(arrays, p)
        saver.write_frame_to_file(arrays, p)
        files = sorted(os.listdir(tmp_path / "frames"))
        assert files == ["frame0000001.geo", "frame0000002.geo"]


class TestNativeSerializer:
    """C++ serializer (native/geo_writer.cpp) vs the NumPy fallback."""

    def test_native_matches_python(self, tmp_path):
        pytest.importorskip("_libclsph_native")
        import _libclsph_native as native

        rng = np.random.default_rng(3)
        n = 500
        pos = (rng.standard_normal((n, 3)) * 10).astype(np.float32)
        vel = rng.standard_normal((n, 3)).astype(np.float32)
        col = rng.random((n, 3)).astype(np.float32)
        p = str(tmp_path / "native.geo")
        native.write_geo(p, pos, vel, col, 0.05)
        expected = geo_format.geo_string(pos, vel, col, 0.05)
        assert open(p).read() == expected

    def test_have_native_probe(self):
        # CI note: True when native/setup.py build_ext ran (it did here)
        assert isinstance(geo_format.have_native(), bool)

    def test_write_geo_file_roundtrip(self, tmp_path):
        pos = np.zeros((4, 3), np.float32)
        vel = np.zeros((4, 3), np.float32)
        col = np.zeros((4, 3), np.float32)
        p = str(tmp_path / "frame.geo")
        geo_format.write_geo_file(p, pos, vel, col, 0.01)
        content = open(p).read()
        assert content.startswith("PGEOMETRY V5\nNPoints 4")


class TestLegacyCheckpoint:
    """Reference last_frame.bin (80-byte AoS records) interop."""

    def test_roundtrip(self, tmp_path):
        from libclsph_tpu.io import legacy

        rng = np.random.default_rng(7)
        n = 50
        arrays = {
            "position": rng.standard_normal((n, 3)).astype(np.float32),
            "velocity": rng.standard_normal((n, 3)).astype(np.float32),
            "intermediate_velocity": rng.standard_normal((n, 3)).astype(np.float32),
            "acceleration": rng.standard_normal((n, 3)).astype(np.float32),
            "density": rng.random(n).astype(np.float32) * 1000,
            "pressure": rng.standard_normal(n).astype(np.float32),
            "grid_index": rng.integers(0, 1 << 30, n).astype(np.uint32),
        }
        p = str(tmp_path / "last_frame.bin")
        legacy.write_legacy_checkpoint(p, arrays)
        assert os.path.getsize(p) == n * 80  # reference struct stride
        out = legacy.read_legacy_checkpoint(p, n)
        for k in arrays:
            np.testing.assert_array_equal(out[k], arrays[k])

    def test_wrong_size_rejected(self, tmp_path):
        from libclsph_tpu.io import legacy

        p = str(tmp_path / "last_frame.bin")
        with open(p, "wb") as f:
            f.write(b"\x00" * 81)
        with pytest.raises(ValueError):
            legacy.read_legacy_checkpoint(p, 1)
