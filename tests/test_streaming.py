"""Streamed raster I/O + whole-scene prediction (ROADMAP round-2 item:
multi-gigapixel AOIs in O(band) memory).

Covers the three new pieces end to end:
* ``geo.tiff.read_window`` — decode only intersecting strips/tiles, for
  every on-disk organization the codec writes (strips/tiles × compression)
* ``geo.tiff.StripStreamWriter`` — strip-at-a-time writes with the IFD
  placed after the pixel data; output must round-trip through ``read``
* ``predict.predict_raster_streamed`` — must produce the exact same mosaic
  as the in-RAM ``predict_raster`` path on the same scene/model
"""

import numpy as np
import pytest

from unet_tpu.geo import tiff


def _scene(h=100, w=130, c=3, dtype=np.uint8, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.random((c, h, w)).astype(dtype)
    return rng.integers(0, np.iinfo(dtype).max, (c, h, w)).astype(dtype)


class TestReadWindow:
    @pytest.mark.parametrize("kw", [
        dict(),
        dict(compress="deflate"),
        dict(compress="lzw"),
        dict(compress="packbits"),
        dict(rows_per_strip=7),
        dict(tile=(16, 16)),
        dict(tile=(32, 16), compress="deflate"),
        dict(bigtiff=True, rows_per_strip=11),
        dict(byteorder=">"),
    ])
    def test_matches_full_read_slices(self, tmp_path, kw):
        arr = _scene()
        p = tmp_path / "s.tif"
        tiff.write(str(p), arr, transform=(0, 1, 0, 0, 0, -1), **kw)
        full, _ = tiff.read(str(p))
        cache = {}
        for (r0, r1, c0, c1) in [(0, 10, 0, None), (13, 57, 20, 77),
                                 (90, 100, 0, None), (0, 100, 0, 130),
                                 (42, 43, 129, 130)]:
            win, _ = tiff.read_window(str(p), r0, r1, c0, c1, _cache=cache)
            want = full[:, r0:r1, c0:(c1 if c1 is not None else 130)]
            np.testing.assert_array_equal(win, want)
        cache["f"].close()

    def test_float_predictor_window(self, tmp_path):
        arr = _scene(dtype=np.float32)
        p = tmp_path / "f.tif"
        tiff.write(str(p), arr, compress="deflate", predictor=True,
                   rows_per_strip=13)
        full, _ = tiff.read(str(p))
        win, _ = tiff.read_window(str(p), 20, 61, 5, 99)
        np.testing.assert_array_equal(win, full[:, 20:61, 5:99])

    def test_out_of_range_clamps(self, tmp_path):
        arr = _scene()
        p = tmp_path / "s.tif"
        tiff.write(str(p), arr)
        win, _ = tiff.read_window(str(p), 95, 200)
        assert win.shape == (3, 5, 130)

    @pytest.mark.parametrize("kw", [
        dict(rows_per_strip=8),
        dict(tile=(16, 16)),
        dict(rows_per_strip=8, compress="deflate"),
    ])
    def test_io_is_o_window_not_o_file(self, tmp_path, kw):
        """A window at the top of a tall scene must read ≪ the file: only
        header + IFD + the intersecting strip/tile byte ranges (the round-2
        implementation slurped the whole file into RAM)."""
        arr = _scene(h=1024, w=256)
        p = tmp_path / "tall.tif"
        tiff.write(str(p), arr, **kw)
        file_size = p.stat().st_size
        cache = {}
        win, _ = tiff.read_window(str(p), 0, 32, _cache=cache)
        full, _ = tiff.read(str(p))
        np.testing.assert_array_equal(win, full[:, :32])
        bytes_read = cache["f"].bytes_read
        cache["f"].close()
        # 32/1024 rows ≈ 3% of pixel data; allow IFD + slack
        assert bytes_read < file_size * 0.15, (bytes_read, file_size)

    @pytest.mark.parametrize("kw", [
        dict(rows_per_strip=8),
        dict(tile=(16, 16)),
    ])
    def test_evict_decoded_rows(self, tmp_path, kw):
        """Top-down consumption with eviction keeps the decoded-segment
        cache bounded for BOTH strip- and tile-organized inputs (the round-2
        eviction keyed on RowsPerStrip and never evicted tiled files)."""
        arr = _scene(h=128, w=64)
        p = tmp_path / "e.tif"
        tiff.write(str(p), arr, **kw)
        full, _ = tiff.read(str(p))
        cache = {}
        max_cached = 0
        for y in range(0, 128, 16):
            win, _ = tiff.read_window(str(p), y, y + 16, _cache=cache)
            np.testing.assert_array_equal(win, full[:, y : y + 16])
            tiff.evict_decoded_rows(cache, y + 16)
            max_cached = max(max_cached, len(cache["segs"]))
        cache["f"].close()
        # segment rows are 8 (strip) or 16 (tile) → a 16-row front touches
        # at most 3 segment rows; tiled files have 4 tiles across
        assert max_cached <= 12, max_cached
        assert len(cache["segs"]) == 0  # everything behind the front evicted

    def test_evict_decoded_rows_planar(self, tmp_path):
        """Planar-separate strips repeat per-plane; eviction must map the
        plane-offset keys back to row extents. The writer emits chunky only,
        so hand-assemble a minimal planar-2 classic TIFF."""
        import struct as _struct

        arr = _scene(h=16, w=8, c=2)
        rps, h, w, c = 4, 16, 8, 2  # one strip per 4 rows per plane
        strips = []
        for b in range(c):
            for s in range(h // rps):
                strips.append(arr[b, s * rps : (s + 1) * rps].tobytes())
        n = len(strips)
        header = _struct.pack("<2sHI", b"II", 42, 8)
        ifd_off = 8
        entries = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, n, 0), (277, 3, 1, c), (278, 4, 1, rps),
            (279, 4, n, 0), (284, 3, 1, 2),
        ]
        ifd_entries = len(entries)
        off_arr_pos = ifd_off + 2 + ifd_entries * 12 + 4
        cnt_arr_pos = off_arr_pos + 4 * n
        data_off = cnt_arr_pos + 4 * n
        offs, pos = [], data_off
        for st in strips:
            offs.append(pos)
            pos += len(st)
        entries = [(273, 4, n, off_arr_pos) if e[0] == 273 else
                   (279, 4, n, cnt_arr_pos) if e[0] == 279 else e
                   for e in entries]
        body = _struct.pack("<H", ifd_entries)
        for tag, ft, cnt, val in entries:
            body += _struct.pack("<HHII", tag, ft, cnt, val)
        body += _struct.pack("<I", 0)
        body += _struct.pack("<" + "I" * n, *offs)
        body += _struct.pack("<" + "I" * n, *[len(s) for s in strips])
        p = tmp_path / "planar.tif"
        p.write_bytes(header + body + b"".join(strips))

        full, info = tiff.read(str(p))
        np.testing.assert_array_equal(full, arr)
        cache = {}
        tiff.read_window(str(p), 0, 4, _cache=cache)
        assert len(cache["segs"]) == 2  # one strip per plane
        tiff.read_window(str(p), 4, 8, _cache=cache)
        tiff.evict_decoded_rows(cache, 8)
        assert len(cache["segs"]) == 0  # both planes' strips 0-1 evicted
        cache["f"].close()


class TestStripStreamWriter:
    @pytest.mark.parametrize("compress", [None, "deflate", "packbits"])
    def test_roundtrip_matches_write(self, tmp_path, compress):
        arr = _scene(h=63, w=41, dtype=np.uint16)
        p = tmp_path / "out.tif"
        wr = tiff.StripStreamWriter(str(p), 63, 41, 3, np.uint16,
                                    transform=(5.0, 0.5, 0.0, 9.0, 0.0, -0.5),
                                    crs="EPSG:25832", nodata=0,
                                    compress=compress, rows_per_strip=10)
        hwc = np.moveaxis(arr, 0, 2)
        pos = 0
        for n in (1, 9, 10, 25, 18):  # uneven chunks straddling strips
            wr.append_rows(hwc[pos:pos + n])
            pos += n
        wr.close()
        back, info = tiff.read(str(p))
        np.testing.assert_array_equal(back, arr)
        assert info.transform == (5.0, 0.5, 0.0, 9.0, 0.0, -0.5)
        assert info.crs == "EPSG:25832"
        assert info.nodata == 0

    def test_chw_chunks_and_bigtiff(self, tmp_path):
        arr = _scene(h=30, w=20, c=1, dtype=np.float32)
        p = tmp_path / "big.tif"
        with tiff.StripStreamWriter(str(p), 30, 20, 1, np.float32,
                                    bigtiff=True, rows_per_strip=8) as wr:
            wr.append_rows(arr[:, :16])
            wr.append_rows(arr[:, 16:])
        back, _ = tiff.read(str(p))
        np.testing.assert_allclose(back, arr)

    def test_incomplete_close_raises(self, tmp_path):
        wr = tiff.StripStreamWriter(str(tmp_path / "x.tif"), 10, 5, 1, np.uint8)
        wr.append_rows(np.zeros((4, 5, 1), np.uint8))
        with pytest.raises(ValueError, match="4/10 rows"):
            wr.close()

    def test_bigtiff_auto_selected_for_huge_outputs(self, tmp_path):
        """A streamed mosaic whose data would overflow classic TIFF's 32-bit
        offsets must auto-upgrade to BigTIFF at close() instead of raising
        struct.error after all compute (ADVICE round 2, high)."""
        # decision function: the exact boundary cases
        assert not tiff._needs_bigtiff(1 << 20, [1000] * 8)
        assert tiff._needs_bigtiff(0xFFFFFFFF + 1, [1000] * 8)
        assert tiff._needs_bigtiff(0xFFFFFFF0, [1000] * 8)  # slack counts
        assert tiff._needs_bigtiff(1 << 20, [0x1_0000_0001])
        # small outputs stay classic TIFF (with the 16-byte prelude)
        p = tmp_path / "small.tif"
        with tiff.StripStreamWriter(str(p), 8, 8, 1, np.uint8) as wr:
            wr.append_rows(np.zeros((8, 8, 1), np.uint8))
        raw = p.read_bytes()
        assert raw[:4] == b"II\x2a\x00"  # classic magic 42
        back, info = tiff.read(str(p))
        assert not info.tags["_bigtiff"]
        assert back.shape == (1, 8, 8)
        # forcing a tiny threshold exercises the close()-time upgrade end
        # to end without writing 4 GiB
        q = tmp_path / "up.tif"
        wr = tiff.StripStreamWriter(str(q), 8, 8, 1, np.uint8)
        wr.append_rows(np.arange(64, dtype=np.uint8).reshape(8, 8, 1))
        wr.bigtiff = True  # what _needs_bigtiff would decide for >4 GiB
        wr.close()
        back, info = tiff.read(str(q))
        assert info.tags["_bigtiff"]
        np.testing.assert_array_equal(back[0].ravel(), np.arange(64))


@pytest.mark.slow
class TestStreamedPrediction:
    def test_streamed_equals_in_ram(self, tmp_path):
        """Train a tiny model, then assert the streamed whole-scene path is
        pixel-identical to the in-RAM predict_raster mosaic."""
        from unet_tpu.predict import predict_raster, predict_raster_streamed
        from unet_tpu.tiling import split_raster
        from unet_tpu.train import TrainerConfig, train_model

        rng = np.random.default_rng(3)
        h = w = 160
        img = rng.integers(10, 60, (3, h, w)).astype(np.uint8)
        msk = np.zeros((h, w), np.uint8)
        msk[40:90, 30:100] = 1
        img[0, 40:90, 30:100] = 200
        T = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        ip = tmp_path / "scene.tif"
        tiff.write(str(ip), img, transform=T, crs="EPSG:32632")
        mp = tmp_path / "mask.tif"
        tiff.write(str(mp), msk[None], transform=T, crs="EPSG:32632")
        split_raster(str(ip), str(mp), str(tmp_path / "tiles"), patch_size=64,
                     patch_overlap=0.2, split=[0.8, 0.2], max_empty=1.0, seed=0)
        cfg = TrainerConfig(
            data_path=tmp_path / "tiles", model_path=tmp_path / "m",
            description="st", batch_size=2, epochs=1, lr=1e-3,
            arch="xresnet18", codes=["bg", "fg"], bf16=False, seed=0,
            visualize_data_example=False, export_model_summary=False,
        )
        bundle = train_model(cfg)

        ram, transform, crs = predict_raster(
            str(bundle), str(ip), patch_size=64, patch_overlap=0.2,
            batch_size=2, device_budget_bytes=0)  # force host accumulator
        out = tmp_path / "streamed.tif"
        predict_raster_streamed(str(bundle), str(ip), str(out),
                                patch_size=64, patch_overlap=0.2, batch_size=2)
        streamed, info = tiff.read(str(out))
        np.testing.assert_array_equal(streamed[0], np.asarray(ram)[..., 0]
                                      if np.asarray(ram).ndim == 3 else np.asarray(ram))
        assert info.transform == T
        assert info.crs == "EPSG:32632"

        # probability outputs stream identically (all_classes: C-band f32)
        ram_ac, _, _ = predict_raster(
            str(bundle), str(ip), patch_size=64, patch_overlap=0.2,
            batch_size=2, all_classes=True, device_budget_bytes=0)
        out_ac = tmp_path / "streamed_ac.tif"
        predict_raster_streamed(str(bundle), str(ip), str(out_ac),
                                patch_size=64, patch_overlap=0.2,
                                batch_size=2, all_classes=True)
        streamed_ac, info_ac = tiff.read(str(out_ac))
        assert streamed_ac.shape[0] == 2 and streamed_ac.dtype == np.float32
        np.testing.assert_allclose(streamed_ac, np.asarray(ram_ac), rtol=1e-6)

    def test_budget_routes_to_streaming(self, tmp_path, capsys):
        """predict_raster silently switches to the streamed path when the
        scene+mosaic would exceed host_budget_bytes."""
        from unet_tpu.predict import predict_raster
        from unet_tpu.tiling import split_raster
        from unet_tpu.train import TrainerConfig, train_model

        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (3, 96, 96)).astype(np.uint8)
        msk = (img[0] > 127).astype(np.uint8)
        ip = tmp_path / "s.tif"
        tiff.write(str(ip), img, transform=(0, 1, 0, 0, 0, -1))
        mp = tmp_path / "m.tif"
        tiff.write(str(mp), msk[None], transform=(0, 1, 0, 0, 0, -1))
        split_raster(str(ip), str(mp), str(tmp_path / "t"), patch_size=48,
                     patch_overlap=0, split=[0.8, 0.2], max_empty=1.0, seed=0)
        cfg = TrainerConfig(
            data_path=tmp_path / "t", model_path=tmp_path / "mm",
            description="b", batch_size=2, epochs=1, lr=1e-3,
            arch="xresnet18", codes=["a", "b"], bf16=False, seed=0,
            visualize_data_example=False, export_model_summary=False,
        )
        bundle = train_model(cfg)
        out = tmp_path / "o.tif"
        arr, _, _ = predict_raster(str(bundle), str(ip), output_path=str(out),
                                   patch_size=48, patch_overlap=0,
                                   batch_size=2, host_budget_bytes=1)
        assert arr is None  # streamed: result lives in the file only
        back, _ = tiff.read(str(out))
        assert back.shape == (1, 96, 96)
        assert set(np.unique(back)) <= {0, 1}
