"""Minimal, dependency-free (Geo)TIFF codec.

The reference stack delegates raster I/O to libgdal/rasterio (C libraries;
see /root/reference/utils.py:39-48, create_tiles_unet.py:208-249,
predict.py:19-52). Neither is available in this environment, so this module
implements the subset of TIFF 6.0 + GeoTIFF that the pipeline needs:

* classic little-endian TIFF, strip-organized
* dtypes: uint8, uint16, int16, int32, uint32, float32, float64
* multi-band, PlanarConfiguration 1 (chunky) and 2 (planar) on read,
  chunky on write
* Compression: 1 (none) and 8 (zlib/"adobe deflate"), horizontal predictor
* GeoTIFF georeferencing: ModelPixelScaleTag + ModelTiepointTag (33550/33922)
  or ModelTransformationTag (34264), GeoKeyDirectory (34735) with EPSG codes,
  GeoAsciiParams (34737), GDAL_NODATA (42113)

Geotransforms use the GDAL 6-tuple convention
``(ulx, xres, xrot, uly, yrot, yres)`` so tiling / mosaic math matches the
reference bit-for-bit (create_tiles_unet.py:289, predict.py:214).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# --- TIFF tag ids -----------------------------------------------------------
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PLANAR_CONFIG = 284
TAG_PREDICTOR = 317
TAG_EXTRA_SAMPLES = 338
TAG_SAMPLE_FORMAT = 339
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_MODEL_TRANSFORMATION = 34264
TAG_GEO_KEY_DIRECTORY = 34735
TAG_GEO_DOUBLE_PARAMS = 34736
TAG_GEO_ASCII_PARAMS = 34737
TAG_GDAL_METADATA = 42112
TAG_GDAL_NODATA = 42113

# --- TIFF field types -------------------------------------------------------
TYPE_BYTE = 1
TYPE_ASCII = 2
TYPE_SHORT = 3
TYPE_LONG = 4
TYPE_RATIONAL = 5
TYPE_SBYTE = 6
TYPE_UNDEFINED = 7
TYPE_SSHORT = 8
TYPE_SLONG = 9
TYPE_SRATIONAL = 10
TYPE_FLOAT = 11
TYPE_DOUBLE = 12

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}

# GeoKey ids
GK_MODEL_TYPE = 1024
GK_RASTER_TYPE = 1025
GK_CITATION = 1026
GK_GEOGRAPHIC_TYPE = 2048
GK_PROJECTED_CS_TYPE = 3072

# sample-format codes
SF_UINT = 1
SF_INT = 2
SF_FLOAT = 3

_DTYPE_TO_SF = {
    np.dtype(np.uint8): SF_UINT,
    np.dtype(np.uint16): SF_UINT,
    np.dtype(np.uint32): SF_UINT,
    np.dtype(np.int8): SF_INT,
    np.dtype(np.int16): SF_INT,
    np.dtype(np.int32): SF_INT,
    np.dtype(np.float32): SF_FLOAT,
    np.dtype(np.float64): SF_FLOAT,
}


def _sf_to_dtype(sample_format: int, bits: int) -> np.dtype:
    table = {
        (SF_UINT, 8): np.uint8,
        (SF_UINT, 16): np.uint16,
        (SF_UINT, 32): np.uint32,
        (SF_INT, 8): np.int8,
        (SF_INT, 16): np.int16,
        (SF_INT, 32): np.int32,
        (SF_FLOAT, 32): np.float32,
        (SF_FLOAT, 64): np.float64,
    }
    key = (sample_format, bits)
    if key not in table:
        raise ValueError(f"Unsupported TIFF sample format/bits: {key}")
    return np.dtype(table[key])


GeoTransform = Tuple[float, float, float, float, float, float]


@dataclass
class TiffInfo:
    """Parsed metadata of a single-IFD TIFF."""

    width: int
    height: int
    bands: int
    dtype: np.dtype
    transform: Optional[GeoTransform]
    crs: Optional[str]
    nodata: Optional[float]
    tags: Dict[int, object]


def _parse_geokeys(tags: Dict[int, object]) -> Optional[str]:
    """Reconstruct a CRS string from the GeoKeyDirectory."""
    gkd = tags.get(TAG_GEO_KEY_DIRECTORY)
    if gkd is None:
        return None
    gkd = list(gkd)
    ascii_params = tags.get(TAG_GEO_ASCII_PARAMS, "")
    n_keys = gkd[3]
    keys = {}
    for i in range(n_keys):
        key_id, loc, count, value = gkd[4 + 4 * i : 8 + 4 * i]
        if loc == 0:
            keys[key_id] = value
        elif loc == TAG_GEO_ASCII_PARAMS:
            keys[key_id] = ascii_params[value : value + count].rstrip("|")
    if GK_PROJECTED_CS_TYPE in keys and isinstance(keys[GK_PROJECTED_CS_TYPE], int):
        return f"EPSG:{keys[GK_PROJECTED_CS_TYPE]}"
    if GK_GEOGRAPHIC_TYPE in keys and isinstance(keys[GK_GEOGRAPHIC_TYPE], int):
        return f"EPSG:{keys[GK_GEOGRAPHIC_TYPE]}"
    if GK_CITATION in keys:
        return str(keys[GK_CITATION])
    return None


def _transform_from_tags(tags: Dict[int, object]) -> Optional[GeoTransform]:
    mt = tags.get(TAG_MODEL_TRANSFORMATION)
    if mt is not None:
        t = list(mt)
        return (t[3], t[0], t[1], t[7], t[4], t[5])
    scale = tags.get(TAG_MODEL_PIXEL_SCALE)
    tie = tags.get(TAG_MODEL_TIEPOINT)
    if scale is None or tie is None:
        return None
    sx, sy = float(scale[0]), float(scale[1])
    i, j, _k, x, y, _z = [float(v) for v in tie[:6]]
    # Tiepoint: raster (i, j) maps to model (x, y); y axis points down.
    return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)


def read_info(path: str) -> TiffInfo:
    """Parse the first IFD of a TIFF without decoding pixel data."""
    with open(path, "rb") as f:
        data = f.read()
    return _parse_info(data)


def _parse_info(data: bytes) -> TiffInfo:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("Not a TIFF file")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        raise ValueError("Not a classic TIFF (BigTIFF unsupported)")
    tags: Dict[int, object] = {}
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack(bo + "HHI", data[off : off + 8])
        size = _TYPE_SIZE.get(ftype, 1) * count
        if size <= 4:
            raw = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        if ftype == TYPE_ASCII:
            tags[tag] = raw.rstrip(b"\x00").decode("latin1")
        elif ftype in _TYPE_FMT:
            vals = struct.unpack(bo + _TYPE_FMT[ftype] * count, raw)
            tags[tag] = vals[0] if count == 1 else list(vals)
        elif ftype in (TYPE_RATIONAL, TYPE_SRATIONAL):
            sub = "II" if ftype == TYPE_RATIONAL else "ii"
            vals = struct.unpack(bo + sub * count, raw)
            ratios = [vals[2 * k] / max(vals[2 * k + 1], 1) for k in range(count)]
            tags[tag] = ratios[0] if count == 1 else ratios
        else:
            tags[tag] = raw

    width = int(tags[TAG_IMAGE_WIDTH])
    height = int(tags[TAG_IMAGE_LENGTH])
    spp = int(tags.get(TAG_SAMPLES_PER_PIXEL, 1))
    bits = tags.get(TAG_BITS_PER_SAMPLE, 8)
    if isinstance(bits, list):
        bits = bits[0]
    sf = tags.get(TAG_SAMPLE_FORMAT, SF_UINT)
    if isinstance(sf, list):
        sf = sf[0]
    dtype = _sf_to_dtype(int(sf), int(bits))

    nodata = None
    if TAG_GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[TAG_GDAL_NODATA]).strip())
        except ValueError:
            nodata = None

    tags["_byteorder"] = bo
    return TiffInfo(
        width=width,
        height=height,
        bands=spp,
        dtype=dtype,
        transform=_transform_from_tags(tags),
        crs=_parse_geokeys(tags),
        nodata=nodata,
        tags=tags,
    )


def read(path: str) -> Tuple[np.ndarray, TiffInfo]:
    """Read a TIFF into a channels-first ``(C, H, W)`` numpy array.

    Mirrors rasterio's ``open(path).read()`` layout used throughout the
    reference (create_tiles_unet.py:282, data.py:20).
    """
    with open(path, "rb") as f:
        data = f.read()
    info = _parse_info(data)
    tags = info.tags
    bo = tags["_byteorder"]

    offsets = tags[TAG_STRIP_OFFSETS]
    counts = tags[TAG_STRIP_BYTE_COUNTS]
    if not isinstance(offsets, list):
        offsets, counts = [offsets], [counts]
    compression = int(tags.get(TAG_COMPRESSION, 1))
    predictor = int(tags.get(TAG_PREDICTOR, 1))
    planar = int(tags.get(TAG_PLANAR_CONFIG, 1))
    rps = int(tags.get(TAG_ROWS_PER_STRIP, info.height))
    h, w, c = info.height, info.width, info.bands
    dt = info.dtype.newbyteorder(bo)

    raw_parts: List[bytes] = []
    for off, cnt in zip(offsets, counts):
        chunk = data[off : off + cnt]
        if compression == 1:
            raw_parts.append(chunk)
        elif compression in (8, 32946):  # deflate / legacy deflate
            raw_parts.append(zlib.decompress(chunk))
        else:
            raise ValueError(f"Unsupported TIFF compression {compression}")

    if planar == 1:
        strips_per_image = (h + rps - 1) // rps
        rows_decoded = []
        for s in range(strips_per_image):
            rows = min(rps, h - s * rps)
            arr = np.frombuffer(raw_parts[s], dtype=dt, count=rows * w * c)
            arr = arr.reshape(rows, w, c)
            if predictor == 2:
                arr = np.cumsum(arr, axis=1, dtype=dt)
            rows_decoded.append(arr)
        hwc = np.concatenate(rows_decoded, axis=0)
        chw = np.ascontiguousarray(np.moveaxis(hwc, 2, 0)).astype(info.dtype)
    else:  # planar == 2: one set of strips per band
        strips_per_band = (h + rps - 1) // rps
        bands = []
        for b in range(c):
            rows_decoded = []
            for s in range(strips_per_band):
                rows = min(rps, h - s * rps)
                part = raw_parts[b * strips_per_band + s]
                arr = np.frombuffer(part, dtype=dt, count=rows * w).reshape(rows, w)
                if predictor == 2:
                    arr = np.cumsum(arr, axis=1, dtype=dt)
                rows_decoded.append(arr)
            bands.append(np.concatenate(rows_decoded, axis=0))
        chw = np.stack(bands, axis=0).astype(info.dtype)
    return chw, info


# --- writer ------------------------------------------------------------------


def _epsg_code(crs: Optional[str]) -> Optional[int]:
    if crs is None:
        return None
    s = str(crs).strip().upper()
    if s.startswith("EPSG:"):
        try:
            return int(s.split(":", 1)[1])
        except ValueError:
            return None
    return None


def _apply_predictor(hwc: np.ndarray) -> np.ndarray:
    out = hwc.copy()
    out[:, 1:, :] = hwc[:, 1:, :] - hwc[:, :-1, :]
    return out


def write(
    path: str,
    array: np.ndarray,
    transform: Optional[GeoTransform] = None,
    crs: Optional[str] = None,
    nodata: Optional[float] = None,
    compress: Optional[str] = None,
    rows_per_strip: Optional[int] = None,
    predictor: bool = False,
) -> None:
    """Write a ``(C, H, W)`` or ``(H, W)`` array as a (Geo)TIFF.

    Equivalent surface to the reference's GDAL write paths
    (create_tiles_unet.py:208-249, predict.py:19-52): georeferencing via the
    GDAL 6-tuple ``transform``, CRS via ``crs`` (``"EPSG:xxxx"`` or free
    text), per-band nodata via ``nodata``.
    """
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3:
        raise ValueError(f"Expected (C,H,W) or (H,W) array, got shape {array.shape}")
    if arr.dtype == np.int64:
        arr = arr.astype(np.int32)
    if arr.dtype == np.float16 or arr.dtype.kind == "V" or str(arr.dtype) == "bfloat16":
        arr = arr.astype(np.float32)
    if arr.dtype not in _DTYPE_TO_SF:
        raise ValueError(f"Unsupported dtype for TIFF write: {arr.dtype}")
    c, h, w = arr.shape
    hwc = np.ascontiguousarray(np.moveaxis(arr, 0, 2))

    if rows_per_strip is None:
        # target ~256 KiB strips for streaming-friendly output
        row_bytes = max(1, w * c * arr.dtype.itemsize)
        rows_per_strip = max(1, min(h, (256 * 1024) // row_bytes))
    n_strips = (h + rows_per_strip - 1) // rows_per_strip

    use_deflate = compress in ("deflate", "zlib", "DEFLATE")
    use_pred = predictor and arr.dtype.kind in "iu"

    strip_payloads: List[bytes] = []
    for s in range(n_strips):
        rows = hwc[s * rows_per_strip : (s + 1) * rows_per_strip]
        if use_pred:
            rows = _apply_predictor(rows)
        payload = rows.tobytes()
        if use_deflate:
            payload = zlib.compress(payload, 6)
        strip_payloads.append(payload)

    entries: List[Tuple[int, int, Sequence]] = []  # (tag, type, values)
    entries.append((TAG_IMAGE_WIDTH, TYPE_LONG, [w]))
    entries.append((TAG_IMAGE_LENGTH, TYPE_LONG, [h]))
    entries.append((TAG_BITS_PER_SAMPLE, TYPE_SHORT, [arr.dtype.itemsize * 8] * c))
    entries.append((TAG_COMPRESSION, TYPE_SHORT, [8 if use_deflate else 1]))
    entries.append((TAG_PHOTOMETRIC, TYPE_SHORT, [1]))
    entries.append((TAG_SAMPLES_PER_PIXEL, TYPE_SHORT, [c]))
    entries.append((TAG_ROWS_PER_STRIP, TYPE_LONG, [rows_per_strip]))
    entries.append((TAG_PLANAR_CONFIG, TYPE_SHORT, [1]))
    if use_pred:
        entries.append((TAG_PREDICTOR, TYPE_SHORT, [2]))
    if c > 1:
        entries.append((TAG_EXTRA_SAMPLES, TYPE_SHORT, [0] * (c - 1)))
    entries.append((TAG_SAMPLE_FORMAT, TYPE_SHORT, [_DTYPE_TO_SF[arr.dtype]] * c))

    if transform is not None:
        ulx, xres, xrot, uly, yrot, yres = [float(v) for v in transform]
        if xrot == 0.0 and yrot == 0.0:
            entries.append((TAG_MODEL_PIXEL_SCALE, TYPE_DOUBLE, [abs(xres), abs(yres), 0.0]))
            entries.append((TAG_MODEL_TIEPOINT, TYPE_DOUBLE, [0.0, 0.0, 0.0, ulx, uly, 0.0]))
        else:
            mt = [xres, xrot, 0.0, ulx, yrot, yres, 0.0, uly, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
            entries.append((TAG_MODEL_TRANSFORMATION, TYPE_DOUBLE, mt))

    geo_ascii = ""
    geokeys: List[Tuple[int, int, int, int]] = []
    epsg = _epsg_code(crs)
    if crs is not None:
        geokeys.append((GK_MODEL_TYPE, 0, 1, 1 if (epsg is None or epsg >= 2000) else 2))
        geokeys.append((GK_RASTER_TYPE, 0, 1, 1))
        if epsg is not None:
            key = GK_GEOGRAPHIC_TYPE if epsg < 2000 else GK_PROJECTED_CS_TYPE
            geokeys.append((key, 0, 1, epsg))
        else:
            citation = str(crs) + "|"
            geokeys.append((GK_CITATION, TAG_GEO_ASCII_PARAMS, len(citation), len(geo_ascii)))
            geo_ascii += citation
    if geokeys:
        gkd = [1, 1, 0, len(geokeys)]
        for k in sorted(geokeys):
            gkd.extend(k)
        entries.append((TAG_GEO_KEY_DIRECTORY, TYPE_SHORT, gkd))
        if geo_ascii:
            entries.append((TAG_GEO_ASCII_PARAMS, TYPE_ASCII, [geo_ascii]))
    if nodata is not None:
        nd = float(nodata)
        nd_str = str(int(nd)) if nd == int(nd) else repr(nd)
        entries.append((TAG_GDAL_NODATA, TYPE_ASCII, [nd_str]))

    # layout: header(8) | IFD | overflow values | strip data
    n_tags = len(entries) + 2  # + StripOffsets, StripByteCounts
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4

    def encode_values(ftype: int, values: Sequence) -> bytes:
        if ftype == TYPE_ASCII:
            return values[0].encode("latin1") + b"\x00"
        fmt = _TYPE_FMT[ftype]
        return struct.pack("<" + fmt * len(values), *values)

    strip_counts = [len(p) for p in strip_payloads]
    entries.append((TAG_STRIP_BYTE_COUNTS, TYPE_LONG, strip_counts))
    # offsets filled after layout below
    entries.append((TAG_STRIP_OFFSETS, TYPE_LONG, [0] * n_strips))
    entries.sort(key=lambda e: e[0])

    overflow_off = ifd_off + ifd_size
    overflow: List[bytes] = []
    encoded: List[Tuple[int, int, int, bytes, Optional[int]]] = []
    for tag, ftype, values in entries:
        raw = encode_values(ftype, values)
        count = len(values[0]) + 1 if ftype == TYPE_ASCII else len(values)
        if len(raw) <= 4:
            encoded.append((tag, ftype, count, raw.ljust(4, b"\x00"), None))
        else:
            pos = overflow_off + sum(len(o) + (len(o) & 1) for o in overflow)
            overflow.append(raw)
            encoded.append((tag, ftype, count, struct.pack("<I", pos), pos))

    data_off = overflow_off + sum(len(o) + (len(o) & 1) for o in overflow)
    strip_offsets = []
    pos = data_off
    for cnt in strip_counts:
        strip_offsets.append(pos)
        pos += cnt

    # patch StripOffsets values now that data_off is known
    raw_offs = struct.pack("<" + "I" * n_strips, *strip_offsets)
    for i, (tag, ftype, count, inline, opos) in enumerate(encoded):
        if tag == TAG_STRIP_OFFSETS:
            if opos is None:
                encoded[i] = (tag, ftype, count, raw_offs.ljust(4, b"\x00"), None)
            else:
                idx = next(
                    k for k, o in enumerate(overflow)
                    if overflow_off + sum(len(x) + (len(x) & 1) for x in overflow[:k]) == opos
                )
                overflow[idx] = raw_offs

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", n_tags)
    for tag, ftype, count, inline, _ in encoded:
        out += struct.pack("<HHI", tag, ftype, count) + inline
    out += struct.pack("<I", 0)  # next IFD
    for o in overflow:
        out += o
        if len(o) & 1:
            out += b"\x00"
    for p in strip_payloads:
        out += p

    with open(path, "wb") as f:
        f.write(bytes(out))
