import numpy as np
import pytest

from unet_tpu.geo import read_raster, write_raster
from unet_tpu.predict.merge import MosaicAccumulator, TileInfo, tile_extent_info

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)


def _info(path, ulx, uly, size=10, res=0.2):
    return TileInfo(path=path, ulx=ulx, xsize=size, xres=res,
                    uly=uly, ysize=size, yres=-res, crs="EPSG:25833")


class TestMosaic:
    def test_nonoverlapping_grid(self):
        # 2x2 grid of 10px tiles
        infos = [
            _info("a", 0.0, 4.0), _info("b", 2.0, 4.0),
            _info("c", 0.0, 2.0), _info("d", 2.0, 2.0),
        ]
        acc = MosaicAccumulator(infos)
        for p, v in zip("abcd", (1.0, 2.0, 3.0, 4.0)):
            stack = np.full((2, 10, 10), v, np.float32)
            stack[0] = 1 - stack[1] if False else stack[0]
            acc.add(np.stack([np.full((10, 10), v, np.float32),
                              np.full((10, 10), 10 - v, np.float32)]), p)
        mosaic, transform, nodata = acc.finalize(all_classes=True)
        assert mosaic.shape == (2, 20, 20)
        assert transform == (0.0, 0.2, 0.0, 4.0, 0.0, -0.2)
        assert mosaic[0, 0, 0] == 1.0 and mosaic[0, 0, 15] == 2.0
        assert mosaic[0, 15, 15] == 4.0
        assert nodata is None

    def test_overlap_average(self):
        # two tiles overlapping by half: values 1 and 3 → overlap mean 2
        infos = [_info("a", 0.0, 2.0), _info("b", 1.0, 2.0)]
        acc = MosaicAccumulator(infos)
        acc.add(np.full((1, 10, 10), 1.0, np.float32), "a")
        acc.add(np.full((1, 10, 10), 3.0, np.float32), "b")
        mosaic, _, _ = acc.finalize(all_classes=True)
        assert mosaic.shape == (1, 10, 15)
        assert mosaic[0, 0, 2] == 1.0
        assert mosaic[0, 0, 7] == 2.0  # overlap
        assert mosaic[0, 0, 12] == 3.0

    def test_argmax_mode(self):
        infos = [_info("a", 0.0, 2.0)]
        acc = MosaicAccumulator(infos)
        stack = np.zeros((3, 10, 10), np.float32)
        stack[2] = 0.9
        acc.add(stack, "a")
        mosaic, _, _ = acc.finalize()
        assert mosaic.shape == (10, 10)
        assert (mosaic == 2).all()

    def test_regression_nodata(self):
        infos = [_info("a", 0.0, 4.0), _info("b", 2.0, 2.0)]  # diagonal, gap
        acc = MosaicAccumulator(infos)
        acc.add(np.full((1, 10, 10), 5.0, np.float32), "a")
        acc.add(np.full((1, 10, 10), 7.0, np.float32), "b")
        mosaic, _, nodata = acc.finalize(regression=True)
        assert nodata == -9999
        assert mosaic[0, 15] == -9999  # top-right gap
        assert mosaic[0, 0] == 5.0

    def test_large_file_integer_division(self):
        infos = [_info("a", 0.0, 2.0), _info("b", 1.0, 2.0)]
        acc = MosaicAccumulator(infos, large_file=True)
        acc.add(np.full((1, 10, 10), 31, np.int8), "a")
        acc.add(np.full((1, 10, 10), 20, np.int8), "b")
        mosaic, _, _ = acc.finalize(all_classes=True)
        assert mosaic.dtype == np.int8
        assert mosaic[0, 0, 7] == (31 + 20) // 2  # int division in overlap

    def test_resolution_warning(self):
        infos = [_info("a", 0.0, 2.0), _info("b", 1.0, 2.0, res=0.4)]
        with pytest.warns(UserWarning, match="resolution"):
            MosaicAccumulator(infos)

    def test_tile_extent_info_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 255, size=(3, 12, 10)).astype(np.uint8)
        p = tmp_path / "t.tif"
        write_raster(p, arr, transform=T, crs="EPSG:25833")
        info = tile_extent_info(str(p))
        assert info.xsize == 10 and info.ysize == 12
        assert info.ulx == T[0] and info.uly == T[3]
        assert info.xres == pytest.approx(0.2) and info.yres == pytest.approx(-0.2)
