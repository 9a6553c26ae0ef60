"""Shared JPEG-test helpers: synthetic scenes, the libjpeg interop
harness (tools/jpegref.c), and coefficient-level entropy dumps for both
Huffman and arithmetic streams. libjpeg is the oracle the entropy
layers are pinned against in both directions."""

import shutil
import subprocess

import numpy as np

from unet_tpu.geo import jpeg, jpeg_arith


def scene(h=53, w=71, seed=2, nc=3):
    """Structured gradient + noise test image, (H, W[, C]) uint8."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [yy * 4 % 251, xx * 3 % 241, (yy + xx) * 2 % 233,
             (yy * xx) % 199][:nc]
    base = np.stack(chans, -1) + rng.normal(0, 15, (h, w, nc))
    arr = np.clip(base, 0, 255).astype(np.uint8)
    return arr[..., 0] if nc == 1 else arr


def build_jpegref(workdir):
    """Compile the libjpeg harness; None when the toolchain is absent."""
    src = __file__.rsplit("/", 2)[0] + "/tools/jpegref.c"
    exe = workdir / "jpegref"
    gcc = shutil.which("gcc") or shutil.which("g++")
    if gcc is None:
        return None
    r = subprocess.run([gcc, "-O2", src, "-o", str(exe), "-ljpeg"],
                       capture_output=True)
    return str(exe) if r.returncode == 0 else None


def libjpeg_encode(exe, arr, tmp, quality=90, progressive=0, restart=0):
    """Encode raw samples with libjpeg's arithmetic coder (PIL covers the
    Huffman side — it IS libjpeg)."""
    nc = 1 if arr.ndim == 2 else arr.shape[2]
    h, w = arr.shape[:2]
    raw = tmp / "in.raw"
    out = tmp / "out.jpg"
    arr.tofile(raw)
    subprocess.run([exe, "enc", str(raw), str(w), str(h), str(nc),
                    str(quality), str(progressive), str(restart), str(out)],
                   check=True, capture_output=True)
    return out.read_bytes()


def libjpeg_coefs(exe, data, tmp):
    """jpeg_read_coefficients dump → per-component (bh, bw, 64) natural
    order int32 arrays."""
    jp = tmp / "c.jpg"
    cb = tmp / "c.bin"
    jp.write_bytes(data)
    subprocess.run([exe, "coef", str(jp), str(cb)], check=True,
                   capture_output=True)
    raw = cb.read_bytes()
    out, off = [], 0
    while off < len(raw):
        _, bh, bw = np.frombuffer(raw[off:off + 12], np.int32)
        off += 12
        out.append(np.frombuffer(raw[off:off + bh * bw * 128], np.int16)
                   .reshape(bh, bw, 64).astype(np.int32))
        off += bh * bw * 128
    return out


def entropy_coefs(data):
    """Entropy-decode every scan of a Huffman- or arithmetic-coded DCT
    stream through our decoder's own scan walkers, returning natural-
    order (bh, bw, 64) coefficient arrays — the instrument that pins the
    entropy layer against libjpeg independent of IDCT rounding."""
    state = jpeg._State()
    scan_pos = jpeg._parse_markers(data, 2, state)
    geom = jpeg._Geometry(state.frame)
    comps = state.frame[3]
    coefs = [np.zeros((nby, nbx, 64), np.int32)
             for nby, nbx, _, _ in geom.grid]
    while scan_pos is not None:
        if state.arith:
            dec = jpeg_arith.decode_scan(data, scan_pos, state, geom, coefs,
                                         comps)
            pos = dec.pos
        else:
            reader = jpeg._BitReader(data, scan_pos)
            jpeg._decode_scan(reader, state, geom, coefs, comps)
            pos = reader.pos
        scan_pos = jpeg._parse_markers(
            data, jpeg._next_marker_pos(data, pos), state)
    nat = []
    for c in coefs:
        g = np.zeros_like(c)
        g[..., jpeg.ZIGZAG] = c
        nat.append(g)
    return nat


def coefs_equal(mine, libjpegs):
    """Compare our (possibly padded) grids against libjpeg's exact dims."""
    return all(np.array_equal(m[:l.shape[0], :l.shape[1]], l)
               for m, l in zip(mine, libjpegs))
